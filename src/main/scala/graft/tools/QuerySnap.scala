package graft.tools

import org.apache.spark.sql.SparkSession

/** Result-equality snapshot for optimization rounds: one canonical md5
  * per declared query (rows collected, rendered, sorted, hashed — order
  * independent), so a restructured query can be PROVEN row-identical to
  * its pre-change form before it ships. Not part of the driver contract.
  *
  * Usage: sbt "runMain graft.tools.QuerySnap /root/testdata/sf0.01 [q...]"
  */
object QuerySnap {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names =
      if (args.length > 1) args.tail.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-query-snap")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val line = try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val schema = df.schema.map(f => s"${f.name}:${f.dataType.sql}")
          .mkString(",")
        val rows = df.collect().map(_.toString).sorted
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.foreach(r => md.update(r.getBytes("UTF-8")))
        md.update(schema.getBytes("UTF-8"))
        val hash = md.digest().map("%02x".format(_)).mkString
        s"$name rows=${rows.length} hash=$hash"
      } catch {
        case e: Throwable => s"$name ERROR ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").take(120)
      }
      println(s"[snap] $line")
    }
    spark.stop()
  }
}
