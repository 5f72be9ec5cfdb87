package graft.tools

import scala.util.Random
import graft.operators.Similarity

/** Measures the bucket-size tail of sign-pattern hyperplane LSH on
  * gaussian vectors — the empirical basis for [[Similarity.autoBits]]'s
  * tail-headroom target and the cap accounting in cosineNearDups: cells
  * of random central hyperplanes are heavy-tailed, so "mean occupancy
  * ~target" does NOT bound the max; the deterministic capped sample +
  * counted drops handle the tail, and multi-table keying recovers pairs
  * a hot table capped away.
  */
object LshTailProbe {
  def main(args: Array[String]): Unit = {
    val dim = if (args.nonEmpty) args(0).toInt else 16
    val n = if (args.length > 1) args(1).toInt else 1000000
    for (bits <- Seq(14, 16, 17, 18, 20, 22)) {
      val planes = Similarity.hyperplanes(dim, bits, 7L)
      val counts = new java.util.HashMap[Long, Int]()
      var i = 0L
      while (i < n) {
        val r2 = new Random(i * 0x9e3779b97f4a7c15L + 5L)
        val v = Array.fill(dim)(r2.nextGaussian())
        var key = 0L
        var b = 0
        while (b < bits) {
          var d = 0.0; var j = 0
          while (j < dim) { d += planes(b)(j) * v(j); j += 1 }
          if (d >= 0) key |= (1L << b)
          b += 1
        }
        counts.merge(key, 1, Integer.sum)
        i += 1
      }
      var max = 0; var over256 = 0; var nb = 0
      var dropped = 0L
      counts.forEach { (_, c) =>
        if (c > max) max = c
        if (c > 256) { over256 += 1; dropped += c - 256 }
        nb += 1
      }
      println(s"bits=$bits buckets=$nb max=$max over256=$over256 " +
        s"dropped=$dropped (${100.0 * dropped / n}%)")
    }
  }
}
