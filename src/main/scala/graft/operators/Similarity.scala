package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a single codegen'd scan with
  * `zip_with`/`aggregate` (no UDF, no collect). Scale path: random
  * hyperplane LSH — candidates meet only in sign-pattern buckets, so the
  * scan narrows by ~2^bits before the exact re-rank.
  */
object Similarity {

  /** Dot product of two array columns (codegen'd). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2norm(a) * l2norm(b)
    when(n === 0, lit(0.0)).otherwise(d / n)
  }

  /** Brute-force cosine top-k against a literal query vector.
    * Deterministic tie-break on the id column.
    */
  def bruteForceTopK(df: DataFrame, vecCol: String, idCol: String,
                     query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(col(idCol),
        round(cosine(col(vecCol).cast("array<double>"), q), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes (seeded; no wall clock). */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-pattern LSH bucket id of a vector column for the given planes. */
  def lshBucket(vecCol: Column, planes: Array[Array[Double]]): Column = {
    val bits: Seq[Column] = planes.zipWithIndex.toSeq.map { case (p, i) =>
      val pl = array(p.map(lit): _*)
      when(dot(vecCol.cast("array<double>"), pl) >= 0, lit(1L << i))
        .otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: probe the query's bucket (plus all buckets within
    * hamming distance 1 for recall), exact re-rank inside. At cluster
    * scale the bucket column is the shuffle/partition key; the probe is a
    * partition-pruned scan instead of a full pass.
    */
  def annTopK(df: DataFrame, vecCol: String, idCol: String,
              query: Seq[Double], k: Int, bits: Int = 8,
              seed: Long = 7L): DataFrame = {
    val planes = hyperplanes(query.length, bits, seed)
    // query bucket + hamming-1 neighborhood, computed driver-side (tiny)
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d >= 0) 1L << i else 0L
    }.sum
    val probes = qBucket +: (0 until bits).map(i => qBucket ^ (1L << i))
    val q = array(query.map(lit): _*)
    df.withColumn("bucket", lshBucket(col(vecCol), planes))
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol),
        round(cosine(col(vecCol).cast("array<double>"), q), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets + exact verify
    * (the embedding leg of the dedup suite).
    */
  def cosineNearDups(df: DataFrame, vecCol: String, idCol: String,
                     threshold: Double = 0.95, bits: Int = 10,
                     maxBucket: Int = 256, seed: Long = 7L): DataFrame = {
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    val planes = hyperplanes(dim, bits, seed)
    val bucketed = df
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
    val buckets = bucketed.groupBy("bucket")
      .agg(collect_list(struct(col("id"), col("v"))).as("docs"))
      .filter(size(col("docs")).between(2, maxBucket))
    buckets
      .select(explode(expr(
        """filter(
             flatten(transform(docs, (a, i) ->
               transform(slice(docs, i + 2, size(docs)), b ->
                 struct(a.id as id_a, b.id as id_b, a.v as v_a, b.v as v_b)))),
             p -> p.id_a < p.id_b)""")).as("p"))
      .select(col("p.id_a"), col("p.id_b"),
        round(cosine(col("p.v_a"), col("p.v_b")), 6).as("cos"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("cos") >= threshold)
  }
}
