package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of Curation.decontaminate at sf scale: which of
  * shingle-explode, md5, broadcast-join, distinct, anti-join carries the
  * q41 wall (slowest query of the r03 table).
  */
object DecontProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    def time(label: String)(f: => Long): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$label%-28s round=$i n=$n%9d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }
    val sh = graft.operators.Dedup.wordShingles(col("text"), 8)
    time("scan only")(corpus.count())
    time("shingle arrays")(corpus.select(size(sh).as("n")).agg(sum("n")).first().getLong(0))
    time("explode")(corpus.select(explode(sh).as("s")).count())
    time("explode+md5")(corpus.select(explode(sh).as("s"))
      .select(md5(col("s")).as("h")).filter(col("h").isNotNull).count())
    time("explode+xxhash64")(corpus.select(explode(sh).as("s"))
      .select(xxhash64(col("s")).as("h")).filter(col("h").isNotNull).count())
    time("full decontaminate")(
      graft.operators.Curation.decontaminate(
        corpus, corpus.filter(col("doc_id") < 15).select("text"),
        "text", "doc_id").count())
    spark.stop()
  }
}
