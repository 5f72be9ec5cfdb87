package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: wall-clock a subset of SparkEntry queries at
  * local[32] on a given sf dir (args: sfDir queryName...). Used to chase
  * the VERDICT r02 near-dup stage-latency items without a full Bench run.
  */
object QueryTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q20_minhash_neardups", "q22_simhash_neardups",
                  "q24_cosine_neardups", "q35_winnowing_neardups",
                  "q27_extract_conv_order")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (round <- 1 to 2; name <- names) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"round=$round $name: n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
