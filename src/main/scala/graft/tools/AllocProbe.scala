package graft.tools

import scala.util.Random

/** Per-turn-type allocation breakdown of the extraction kernel: which
  * generator case (plain / markup / html / prose) allocates what, per
  * stage. Guides the bandwidth work in BENCH/BASELINE.md.
  */
object AllocProbe {
  def main(args: Array[String]): Unit = {
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread().getId
    val N = 100000

    def mkTexts(kind: Int): Array[String] = {
      val rnd = new Random(42)
      Array.fill(N) {
        var t = graft.pipeline.Transcripts.turnText(rnd)
        var guard = 0
        while (classify(t) != kind && guard < 1000) {
          t = graft.pipeline.Transcripts.turnText(rnd); guard += 1
        }
        t
      }
    }
    def classify(t: String): Int =
      if (t.startsWith("^C ")) 0
      else if (t.startsWith("<html")) 1
      else if (t.indexOf('\n') >= 0) 2
      else 3

    def measure(label: String, f: Int => Any): Unit = {
      f(0) // warm
      val a0 = tmx.getThreadAllocatedBytes(tid)
      var i = 0
      while (i < N) { f(i); i += 1 }
      println(f"  $label: ${(tmx.getThreadAllocatedBytes(tid) - a0) / N.toDouble}%.0f B")
    }

    for ((kind, name) <- Seq(3 -> "plain-single", 2 -> "prose-multi",
        0 -> "markup-doc", 1 -> "html")) {
      val texts = mkTexts(kind)
      val avgLen = texts.map(_.length.toLong).sum / N
      println(s"case $name (avg ${avgLen} chars):")
      val toks = new Array[Seq[graft.core.BodyElement]](N)
      measure("tokenize", j => { toks(j) = graft.core.Tokenizer.tokenize(texts(j)); toks(j) })
      val mds = new Array[graft.core.MultiDoc](N)
      measure("segment", j => { mds(j) = graft.core.Segmenter.segment(toks(j)); mds(j) })
      measure("extractedText", j => graft.core.Segmenter.extractedText(mds(j)))
      measure("full extract", j => graft.pipeline.TurnExtractor.extract("c", 0, texts(j)))
    }
  }
}
