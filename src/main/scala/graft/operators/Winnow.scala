package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document fingerprinting by rolling hash + winnowing (Schleimer,
  * Wilkerson, Aiken, "Winnowing: Local Algorithms for Document
  * Fingerprinting", SIGMOD 2003 — public knowledge): Rabin-Karp rolling
  * hash over character k-grams, then keep the minimum hash of every
  * window of w consecutive k-gram hashes. Guarantees any shared
  * substring of length >= w + k - 1 yields a shared fingerprint —
  * the candidate generator for substring-level near-dup detection
  * (complements MinHash, which is bag-of-shingles level).
  */
object Winnow {

  private val Base = 0x100000001b3L

  /** Winnowing fingerprint set of a normalized text. */
  def fingerprints(text: String, k: Int = 8, w: Int = 16): Array[Long] = {
    if (text == null) return Array.empty
    val s = text.toLowerCase
    val n = s.length
    if (n < k) return Array.empty
    // rolling Rabin-Karp over k-grams
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= Base; i += 1 }
    val hashes = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + s.charAt(i); i += 1 }
    hashes(0) = mix(h)
    i = k
    while (i < n) {
      h = (h - s.charAt(i - k) * pow) * Base + s.charAt(i)
      hashes(i - k + 1) = mix(h)
      i += 1
    }
    // winnowing: min of each window, emitted once per distinct position
    if (hashes.length <= w) {
      return Array(hashes.min)
    }
    val out = new scala.collection.mutable.LinkedHashSet[Long]
    var lastMinPos = -1
    var win = 0
    while (win + w <= hashes.length) {
      var minPos = win
      var j = win + 1
      while (j < win + w) {
        if (hashes(j) <= hashes(minPos)) minPos = j // rightmost min
        j += 1
      }
      if (minPos != lastMinPos) {
        out += hashes(minPos)
        lastMinPos = minPos
      }
      win += 1
    }
    out.toArray
  }

  private def mix(x: Long): Long = {
    var v = x
    v ^= (v >>> 33); v *= 0xff51afd7ed558ccdL; v ^= (v >>> 33)
    v
  }

  /** Near-dup candidate pairs: docs sharing any winnowing fingerprint
    * (bucket join on the fingerprint — same scale shape as MinHash LSH),
    * scored by the count of shared fingerprints.
    */
  def sharedFingerprintPairs(df: DataFrame, textCol: String, idCol: String,
                             k: Int = 8, w: Int = 16,
                             minShared: Int = 2,
                             maxBucket: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fps = df.select(col(idCol).cast("long").as("id"),
        col(textCol).as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        fingerprints(text, k, w).map(fp => (id, fp))
      }
      .toDF("id", "fp")
    val buckets = fps.groupBy("fp")
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    buckets
      .select(explode(expr(
        """filter(
             flatten(transform(ids, (a, i) ->
               transform(slice(ids, i + 2, size(ids)), b ->
                 struct(a as id_a, b as id_b)))),
             p -> p.id_a < p.id_b)""")).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
