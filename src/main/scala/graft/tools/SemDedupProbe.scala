package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost decomposition of q77 (semDedup) at a given sf dir:
  * how much of the wall is pivot selection, assignment, the
  * cluster-pair join, and the interpreted higher-order cosine.
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding", "label")
    val copies = emb.filter(col("vec_id") < 30)
      .select((col("vec_id") + 1000000).as("vec_id"),
        col("embedding"), col("label"))
    val corpus = emb.unionByName(copies)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (rnd <- 1 to 2) {
      println(s"--- round $rnd ---")
      val pivots = time("samplePivots")(
        Similarity.samplePivots(corpus, "embedding", "vec_id", 16))
      val assigned = Similarity.ivfIndex(corpus, "embedding", pivots)
      time("assign+count")(assigned.count())
      val byList = time("clusterSizes")(
        assigned.groupBy("list_id").count().collect()
          .map(r => r.getLong(1)).sorted.reverse.toSeq)
      println(s"cluster sizes: $byList")
      val a = assigned.select(col("list_id"), col("vec_id"),
        col("embedding"))
      val b = assigned.select(col("list_id"),
        col("vec_id").as("id2"), col("embedding").as("e2"))
      time("pairCount")(println("pairs=" + a.join(b, "list_id")
        .where(col("vec_id") > col("id2")).count()))
      time("pairCosine")(println("close=" + a.join(b, "list_id")
        .where(col("vec_id") > col("id2") &&
          round(Similarity.cosine(col("embedding"), col("e2")), 6) >= 0.99)
        .count()))
      time("fullSemDedup")(println("kept=" +
        Similarity.semDedup(corpus, "embedding", "vec_id", pivots,
          tau = 0.99).count()))
    }
    spark.stop()
  }
}
