package graft.tools

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Pure-thread-pool decode scaling (no Spark): isolates whether the
  * decode tier itself scales with threads, or carries a shared lock /
  * allocation wall. Pairs with [[DecodeScaleProbe]] the way
  * KernelScaleProbe pairs with the bench's extraction job.
  */
object DecodeKernelProbe {
  def main(args: Array[String]): Unit = {
    DecodeScaleProbe.ensureCorpus()
    val dir = new java.io.File(DecodeScaleProbe.corpusDir)
    val files = dir.listFiles().filter(_.getName.startsWith("doc_"))
      .sortBy(_.getName)
    val bytes = files.map(f =>
      java.nio.file.Files.readAllBytes(f.toPath))
    println(s"${bytes.length} files, ${bytes.map(_.length.toLong).sum / 1024} KiB")

    def run(threads: Int): Double = {
      val pool = Executors.newFixedThreadPool(threads)
      val next = new AtomicInteger(0)
      val ok = new AtomicInteger(0)
      val t0 = System.nanoTime()
      for (_ <- 0 until threads) pool.execute { () =>
        var i = next.getAndIncrement()
        while (i < bytes.length) {
          if (graft.sources.BinaryDispatch.safeDecode(bytes(i)).status == "ok")
            ok.incrementAndGet()
          i = next.getAndIncrement()
        }
      }
      pool.shutdown()
      pool.awaitTermination(600, TimeUnit.SECONDS)
      require(ok.get == bytes.length, s"ok=${ok.get}")
      bytes.length / ((System.nanoTime() - t0) / 1e9)
    }

    run(8) // warm
    for (t <- Seq(1, 8, 32)) {
      val best = (1 to 3).map(_ => run(t)).max
      println(f"threads=$t best=$best%.0f files/s")
    }
  }
}
