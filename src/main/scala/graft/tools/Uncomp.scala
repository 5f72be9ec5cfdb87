package graft.tools
import org.apache.spark.sql.SparkSession
object Uncomp {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.read.parquet("/tmp/probe_in").repartition(96)
      .write.mode("overwrite").option("compression", "none")
      .parquet("/tmp/probe_in_uncomp")
    s.stop()
  }
}
