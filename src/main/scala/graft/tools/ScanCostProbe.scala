package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes the stats-job wall at local[32]: parquet scan + length
  * (no kernel), token_count (byte-scan expression, no String), and the
  * full extract_stats kernel — bounds how much of the Spark-vs-pure-
  * kernel gap is scan/decode vs the kernel itself.
  */
object ScanCostProbe {
  def main(args: Array[String]): Unit = {
    val inputDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = spark.read.parquet(inputDir)
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (round <- 1 to 3) {
      time(s"r$round scan+length   ")(
        raw.select(sum(length(col("text")))).collect())
      time(s"r$round token_count   ")(
        raw.select(sum(graft.functions.TokenCount.tokenCount(col("text"))))
          .collect())
      time(s"r$round extract_stats ")(
        raw.select(graft.functions.ExtractStats.extractStats(col("text"))
            .as("s"))
          .agg(count(lit(1)), sum("s.n_bytes")).collect())
    }
    spark.stop()
  }
}
