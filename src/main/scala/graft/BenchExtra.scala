package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Extra measurement harness for the optimization rounds (guide §1.4).
  *
  * NOT part of the driver contract — Bench.scala is frozen; this main
  * exists so per-query timings, noop-sink isolation and formatted plans
  * can be captured without touching the graded harness. Session config
  * mirrors Bench's phase-4 query session exactly (local[cpus], shuffle
  * partitions = cpus, AQE on) so numbers are comparable.
  *
  * Usage: sbt "runMain graft.BenchExtra [--passes N] [--noop]
  *   [--explain plans/r06 --suffix _before] [q26_extract_transcripts ...]"
  * With no query args, runs every declared query once in name order
  * (the Bench phase-4 protocol).
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    var passes = 1
    var noop = false
    var explainDir: Option[String] = None
    var suffix = ""
    val names = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--passes" => passes = args(i + 1).toInt; i += 2
        case "--noop" => noop = true; i += 1
        case "--explain" => explainDir = Some(args(i + 1)); i += 2
        case "--suffix" => suffix = args(i + 1); i += 2
        case q => names += q; i += 1
      }
    }
    val selected =
      if (names.nonEmpty) names.toSeq
      else SparkEntry.queries.keys.toSeq.sorted

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-job wall breakdown (enable with GRAFT_BENCH_JOBS=1): prints
    // every Spark job's duration + stage count so orchestration-bound
    // queries (many tiny sequential jobs) are diagnosable
    if (sys.env.get("GRAFT_BENCH_JOBS").contains("1")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts =
            new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(j.jobId, (System.nanoTime(),
              s"${j.stageInfos.size}stg " + Option(j.properties)
                .flatMap(p => Option(p.getProperty(
                  "spark.job.description"))).getOrElse("")))
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = starts.remove(j.jobId)
            if (s != null) System.err.println(
              f"[job] ${j.jobId}%4d ${(System.nanoTime() - s._1) / 1e9}%7.3fs ${s._2}")
          }
        })
    }

    explainDir.foreach(d => Files.createDirectories(Paths.get(d)))

    val out = new StringBuilder("{")
    for ((name, qi) <- selected.zipWithIndex) {
      val fn = SparkEntry.queries(name)
      val times = (1 to passes).map { p =>
        spark.sparkContext.setJobDescription(s"$name pass $p")
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          if (noop) df.write.format("noop").mode("overwrite").save()
          else df.count()
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench-extra] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.setJobDescription(null)
      explainDir.foreach { d =>
        try {
          val df = fn(spark, sfDir)
          Files.writeString(Paths.get(d, s"$name$suffix.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench-extra] explain $name failed: " +
              e.getMessage)
        }
      }
      if (qi > 0) out ++= ","
      out ++= s""""$name":[${times.map(t => f"$t%.3f").mkString(",")}]"""
      System.err.println(
        f"[bench-extra] $name: ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    out ++= "}"
    println(out.toString)
    spark.stop()
  }
}
