package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch repro for the r03 bench anomaly: local[N] sessions first (as
  * Bench runs them), THEN a local-cluster 8x4 session in the same driver
  * JVM — isolates whether the cluster pair's low readings are an
  * order/interaction effect or external host load.
  */
object BenchOrderProbe {
  def main(args: Array[String]): Unit = {
    val inputDir = args(0)
    val classes = "/root/repo/target/scala-2.13/classes"
    import org.apache.spark.sql.functions._
    def statsJob(s: SparkSession): Long =
      s.read.parquet(inputDir)
        .select(graft.functions.ExtractStats.extractStats(col("text")).as("s"))
        .agg(count(lit(1)), sum("s.n_bytes")).collect().head.getLong(0)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label: n=$n $sec%.2f s tp=${n / sec}%.0f t/s")
    }
    def stop(): Unit = {
      SparkSession.getActiveSession.foreach(_.stop())
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    // phase 1: local sessions, bench-style
    for (cores <- Seq(8, 32)) {
      stop()
      val s = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.local.dir", "/dev/shm/graft-spark-local")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      time(s"local[$cores]-1")(statsJob(s))
      time(s"local[$cores]-2")(statsJob(s))
    }
    // phase 2: cluster session in the same driver JVM
    for ((execs, coresPer) <- Seq((8, 4), (2, 4), (8, 4))) {
      stop()
      val s = SparkSession.builder()
        .master(s"local-cluster[$execs,$coresPer,8192]")
        .config("spark.executor.extraClassPath", classes)
        .config("spark.executor.memory", "1g")
        .config("spark.executor.extraJavaOptions",
          s"-XX:ActiveProcessorCount=$coresPer -XX:+UseParallelGC " +
            s"-XX:NewRatio=1 -XX:ParallelGCThreads=$coresPer")
        .config("spark.locality.wait", "0")
        .config("spark.sql.shuffle.partitions", (execs * coresPer).toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      val taskStats = new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = e.taskMetrics
            if (m != null) {
              val a = taskStats.computeIfAbsent(e.taskInfo.executorId,
                _ => new Array[Long](5))
              a.synchronized {
                a(0) += 1
                a(1) += m.executorRunTime
                a(2) += m.jvmGCTime
                a(3) += m.executorDeserializeTime
                a(4) = math.max(a(4), m.executorRunTime)
              }
            }
          }
        })
      for (i <- 1 to 6) {
        taskStats.clear()
        time(s"cluster-${execs}x$coresPer-$i")(statsJob(s))
        val agg = taskStats.values().toArray(Array.empty[Array[Long]])
        val n = agg.map(_(0)).sum
        println(f"  pass $i: tasks=$n runTime=${agg.map(_(1)).sum / 1e3}%.1fs " +
          f"gc=${agg.map(_(2)).sum / 1e3}%.1fs deser=${agg.map(_(3)).sum / 1e3}%.1fs " +
          f"nExecs=${agg.length} maxTaskRun=${agg.map(_(4)).max / 1e3}%.1fs")
      }
      s.stop()
    }
  }
}
