package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage-level wall-clock of the q20 minhash pipeline at sf0.1. */
object Q20Probe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val d = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val mutated = d.filter(col("doc_id") < 50)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" extra tail tokens")).as("text"))
    val corpus = d.unionByName(mutated)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // warm
    Dedup.minhashNearDups(corpus, "text", "doc_id", threshold = 0.5).count()

    time("full q20")(
      Dedup.minhashNearDups(corpus, "text", "doc_id", threshold = 0.5).count())

    val base = corpus.select(col("doc_id").cast("long").as("id"),
      col("text").as("text"))
    time("base.count")(base.count())
    val keyed = base.select(col("id"),
      md5(graft.operators.TextStats.normalize(col("text"))).as("gk"))
    time("keyed.count")(keyed.count())
    val mapping = keyed.groupBy("gk").agg(min("id").as("rep"))
      .join(keyed, "gk").select("id", "rep")
    time("mapping.count")(mapping.count())
    val reps = base.join(mapping, "id")
      .filter(col("id") === col("rep")).select("id", "text")
    time("reps.count")(reps.count())
    val banded = reps.as[(Long, String)].mapPartitions(_.flatMap {
      case (id, text) =>
        val sh = Dedup.shingleSet(text, 3)
        if (sh.isEmpty) Iterator.empty
        else {
          val sig = Dedup.minhashSig(sh, 64)
          Iterator.single((id, sig.length.toLong))
        }
    }).toDF("id", "x")
    time("shingle+sig only")(banded.count())
    spark.stop()
  }
}
