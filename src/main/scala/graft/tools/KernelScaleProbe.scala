package graft.tools

import org.apache.spark.sql.SparkSession
import java.util.concurrent.{Callable, Executors, TimeUnit}

/** Pure-kernel thread-scaling probe: same texts, plain thread pool,
  * no Spark in the measured section. Separates kernel scaling from
  * Spark scan/serde/GC effects.
  */
object KernelScaleProbe {
  def main(args: Array[String]): Unit = {
    val inputDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val texts: Array[String] = spark.read.parquet(inputDir)
      .select("text").collect().map(_.getString(0))
    spark.stop()
    println(s"loaded ${texts.length} texts")

    def run(threads: Int): Double = {
      val pool = Executors.newFixedThreadPool(threads)
      val chunk = (texts.length + threads - 1) / threads
      val t0 = System.nanoTime()
      val futs = (0 until threads).map { t =>
        pool.submit(new Callable[Long] {
          def call(): Long = {
            var acc = 0L
            var i = t * chunk
            val end = math.min(texts.length, (t + 1) * chunk)
            while (i < end) {
              val turn = graft.pipeline.Turn("c", 0, "user", texts(i), null, null)
              acc += graft.pipeline.TurnExtractor.extract(turn).nBytes
              i += 1
            }
            acc
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.MINUTES)
      (System.nanoTime() - t0) / 1e9
    }
    // bytes allocated per turn (precise, single thread)
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    val a0 = tmx.getThreadAllocatedBytes(tid)
    var i = 0
    while (i < 200000) {
      graft.pipeline.TurnExtractor.extract("c", 0, texts(i))
      i += 1
    }
    val perTurn = (tmx.getThreadAllocatedBytes(tid) - a0) / 200000.0
    println(f"allocated bytes/turn: $perTurn%.0f")

    def allocOf(label: String)(f: Int => Any): Unit = {
      val b0 = tmx.getThreadAllocatedBytes(tid)
      var j = 0
      while (j < 200000) { f(j); j += 1 }
      println(f"$label: ${(tmx.getThreadAllocatedBytes(tid) - b0) / 200000.0}%.0f B/turn")
    }
    val toks = new Array[Seq[graft.core.BodyElement]](200000)
    allocOf("tokenize")(j => { toks(j) = graft.core.Tokenizer.tokenize(texts(j)); toks(j) })
    val mds = new Array[graft.core.MultiDoc](200000)
    allocOf("segment")(j => { mds(j) = graft.core.Segmenter.segment(toks(j)); mds(j) })
    allocOf("extractedText")(j => graft.core.Segmenter.extractedText(mds(j)))
    allocOf("avg text len probe")(j => texts(j).length)

    run(32) // warmup
    for (threads <- Seq(2, 8, 4, 16, 8, 32, 2, 8, 4, 16, 8, 32)) {
      val s = run(threads)
      println(f"threads=$threads wall=$s%.2f s tp=${texts.length / s}%.0f turns/s")
    }
  }
}
