package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
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
    *
    * Scale rules shared with [[Dedup]]: exact duplicates (identical
    * lowercased text => identical fingerprint set) collapse to one
    * representative before bucketing, so boilerplate mega-clusters can't
    * blow the bucket cap; a hot fingerprint bucket larger than
    * `maxBucket` contributes a deterministic sample (ids sorted, first
    * maxBucket) instead of silently vanishing, with the cap counted into
    * `statsObs` (n_buckets / n_oversized_buckets / n_docs_dropped).
    * Member pairs are expanded back at the end: cross pairs inherit the
    * representative pair's n_shared exactly (identical fingerprint
    * sets); internal pairs of an exact group share ALL fingerprints, so
    * n_shared = the group's distinct fingerprint count.
    */
  def sharedFingerprintPairs(df: DataFrame, textCol: String, idCol: String,
                             k: Int = 8, w: Int = 16,
                             minShared: Int = 2,
                             maxBucket: Int = 64,
                             statsObs: Option[Observation] = None): DataFrame = {
    val (collapsed, _, verified, eligible) =
      winnowRepPairs(df, textCol, idCol, k, w, minShared, maxBucket, statsObs)

    // expansion (see scaladoc): internal groups qualify iff their
    // fingerprint count reaches minShared. mapping is DUP-ONLY
    // (Dedup.collapse), so singleton docs never enter the self-join
    // (VERDICT r02 #6) and the whole branch is skipped without dups.
    collapsed.dupMapping match {
      case None => verified
      case Some(mapping) =>
        val members = mapping.join(eligible, "rep")
        val internal = members
          .select(col("rep"), col("_gn"), col("id").as("id_a"))
          .join(members.select(col("rep"), col("id").as("id_b")), "rep")
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"), col("_gn").as("n_shared"))
        Dedup.expandCross(verified, mapping, "n_shared").unionByName(internal)
    }
  }

  /** Transitive winnowing GROUP labeling `(id, group_id)` — the
    * [[Dedup.minhashNearDupGroups]] construction for the fingerprint
    * leg: connected components over verified representative pairs plus
    * one mapping join, never the quadratic member-pair expansion.
    * Internal-group eligibility matches [[sharedFingerprintPairs]]:
    * exact groups whose fingerprint count reaches `minShared`.
    */
  def sharedFingerprintGroups(df: DataFrame, textCol: String, idCol: String,
                              k: Int = 8, w: Int = 16,
                              minShared: Int = 2,
                              maxBucket: Int = 64,
                              statsObs: Option[Observation] = None): DataFrame = {
    val (collapsed, _, verified, eligible) =
      winnowRepPairs(df, textCol, idCol, k, w, minShared, maxBucket, statsObs)
    Dedup.groupsFromRepPairs(collapsed,
      verified.select("id_a", "id_b"), eligible.select("rep"))
  }

  /** Shared front: collapse -> fingerprint emission -> bounded buckets
    * -> co-occurrence-counted pairs at REPRESENTATIVE level. Returns
    * (collapsed, fps(id, fp, nfp), verified(id_a, id_b, n_shared),
    * eligible(rep, _gn)) — the internal-group gate (fingerprint count
    * >= minShared) is computed HERE, once, so the pair and group
    * surfaces cannot drift apart on it.
    */
  private def winnowRepPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int, w: Int, minShared: Int, maxBucket: Int,
      statsObs: Option[Observation]): (Dedup.Collapsed, DataFrame, DataFrame, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"),
      col(textCol).as("text"))

    // exact collapse (fingerprints depend on lowercased text only); the
    // text payload rides the PERSISTED collapse agg — no recovery join,
    // and every downstream scan of reps hits the cache
    val collapsed = Dedup.collapse(
      base.select(col("id"), md5(lower(col("text"))).as("gk"),
        col("text").as("payload")))
    val reps = collapsed.reps.withColumnRenamed("payload", "text")

    // (id, fp, nfp) rows; nfp rides along for the internal-pair score
    val fps = reps.as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val f = fingerprints(text, k, w)
        f.iterator.map(fp => (id, fp, f.length))
      })
      .toDF("id", "fp", "nfp")

    // bounded buckets (cap enforced pre-materialization, Dedup scale rule
    // 4); pairs are NOT deduped here — n_shared is the count of buckets
    // (fingerprints) a pair co-occurs in
    val verified = Dedup.boundedBuckets(
        fps.select(col("id"), col("fp").as("bkey")), maxBucket, statsObs)
      .select(explode(expr(
        """flatten(transform(ids, (a, i) ->
             transform(slice(ids, i + 2, size(ids)), b ->
               struct(a as id_a, b as id_b))))""")).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    val eligible = fps.select(col("id").as("rep"), col("nfp"))
      .groupBy("rep").agg(max("nfp").cast("long").as("_gn"))
      .filter(col("_gn") >= minShared)
    (collapsed, fps, verified, eligible)
  }
}
