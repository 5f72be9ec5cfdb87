package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora.
  *
  * Scale design, shared by every near-dup variant (MinHash LSH here,
  * SimHash here, winnowing in [[Winnow]], embedding-cosine in
  * [[Similarity]]):
  *
  *   1. candidates meet only inside an LSH/band/chunk bucket — never an
  *      all-pairs product; the shuffle key is the bucket hash;
  *   2. exact duplicates are collapsed to one representative BEFORE any
  *      LSH stage (the most-duplicated web content — boilerplate,
  *      licenses — is byte-identical, and it is exactly what used to
  *      blow the bucket cap); member pairs are expanded back at the end,
  *      so output semantics are unchanged;
  *   3. bucket shuffles carry (id, bucketKey) ONLY — shingle arrays and
  *      embedding vectors rejoin by id for the exact verification of the
  *      (small) candidate set, instead of being replicated through every
  *      band (a 16x corpus blow-up at bands=16);
  *   4. a bucket still larger than `maxBucket` after exact-collapse is
  *      capped to a deterministic sample (ids sorted, first `maxBucket`)
  *      — recall degrades gracefully instead of the bucket silently
  *      vanishing — and the cap is COUNTED: pass an
  *      [[org.apache.spark.sql.Observation]] as `statsObs` and read
  *      `n_buckets` / `n_oversized_buckets` / `n_docs_dropped` after the
  *      action completes.
  *
  * Note on output size: the pair contract is inherently quadratic in
  * cluster size (a verified 10^4-member cluster IS ~5*10^7 pairs). When a
  * summarized report is enough, use [[exactDupGroups]] + the rep-level
  * pairs instead of the expanded output.
  */
object Dedup {

  // ---------- exact ----------

  /** Exact duplicate groups by normalized-text hash (one shuffle). */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), TextStats.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(count("*").as("n_dups"), min(idCol).as("keep_id"))
      .filter(col("n_dups") > 1)

  /** Keep one representative per normalized text (min id wins).
    * Aggregate-then-join, NOT a window over the fingerprint: a window
    * would land a mega-cluster of identical docs (boilerplate, licenses)
    * on one task; the agg side combines map-side and the join is
    * AQE-skew-splittable (scale rule 2 of the object scaladoc).
    */
  def dropExactDups(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = TextStats.fingerprint(col(textCol))
    val keep = df.select(fp.as("_fp"), col(idCol).as("_keep"))
      .groupBy("_fp").agg(min("_keep").as("_keep"))
    df.withColumn("_fp", fp)
      .join(keep, "_fp")
      .filter(col(idCol) === col("_keep"))
      .drop("_fp", "_keep")
  }

  // ---------- shared scale plumbing ----------

  /** Exact-collapse with the representative's payload carried THROUGH
    * the aggregation (min_by): one shuffle yields both the (id, rep)
    * membership mapping and the representative rows — no extra join to
    * recover payloads (map-side combine keeps one payload per key per
    * partition, so the wide column does not amplify the shuffle). Groups
    * stay as ROWS (no collect_list), so a 10^9-member cluster is 10^9
    * narrow rows, never one driver-sized row; the group-key join is
    * AQE-skew-splittable because the aggregated side has one row per key.
    * Input columns: (id, gk, payload). Returns (mapping, reps).
    */
  private[operators] def collapse(keyed: DataFrame)
      : (DataFrame, DataFrame) = {
    val agg = keyed.groupBy("gk").agg(min("id").as("rep"),
      min_by(col("payload"), col("id")).as("payload"))
    val mapping = agg.select("gk", "rep")
      .join(keyed.select("id", "gk"), "gk")
      .select("id", "rep")
    val reps = agg.select(col("rep").as("id"), col("payload"))
    (mapping, reps)
  }

  /** Candidate pairs from id-only buckets, with the deterministic cap of
    * scale rule 4 (ids sorted, first `maxBucket` kept) and optional
    * observed drop metrics. Input: one row per bucket with an `ids`
    * array column. Output: distinct (id_a < id_b) pairs.
    */
  private[operators] def bucketPairs(buckets: DataFrame, maxBucket: Int,
      statsObs: Option[Observation]): DataFrame = {
    val withCap = buckets
      .withColumn("_n", size(col("ids")))
      .filter(col("_n") >= 2)
      .withColumn("_capped", expr(s"slice(array_sort(ids), 1, $maxBucket)"))
    val observed = statsObs match {
      case Some(o) => withCap.observe(o,
        count(lit(1)).as("n_buckets"),
        coalesce(sum(when(col("_n") > maxBucket, 1L)), lit(0L))
          .as("n_oversized_buckets"),
        coalesce(sum(when(col("_n") > maxBucket, col("_n") - maxBucket)),
          lit(0L)).as("n_docs_dropped"))
      case None => withCap
    }
    observed.select(explode(expr(
      """flatten(transform(_capped, (a, i) ->
           transform(slice(_capped, i + 2, size(_capped)), b ->
             struct(a as id_a, b as id_b))))""")).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      // guard against a caller-produced bucket holding one id twice (e.g.
      // two band keys of a doc colliding to one 64-bit bkey): a self-pair
      // would survive every verify at similarity 1.0
      .filter(col("id_a") =!= col("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Expand verified representative pairs to member pairs: every member
    * of rep_a's exact group pairs with every member of rep_b's, carrying
    * the verified payload column (identical inputs have identical
    * shingles/vectors, so the metric transfers exactly).
    */
  private[operators] def expandCross(repPairs: DataFrame, mapping: DataFrame,
      payloadCol: String): DataFrame =
    repPairs
      .join(mapping.select(col("rep").as("id_a"), col("id").as("_ma")), "id_a")
      .join(mapping.select(col("rep").as("id_b"), col("id").as("_mb")), "id_b")
      .select(least(col("_ma"), col("_mb")).as("id_a"),
        greatest(col("_ma"), col("_mb")).as("id_b"), col(payloadCol))

  /** Internal pairs of each exact group restricted to eligible reps
    * (single-column `rep` DataFrame): (id_a < id_b) member pairs.
    * Built from NON-representative members only — singleton groups (the
    * overwhelming majority of a deduplicated corpus) never enter the
    * self-join; rep-member pairs come straight off the dup rows since
    * rep = min(id) < member id.
    */
  private[operators] def expandInternal(mapping: DataFrame,
      eligibleReps: DataFrame): DataFrame = {
    val dups = mapping.filter(col("id") =!= col("rep"))
      .join(eligibleReps, Seq("rep"), "left_semi")
    val repPairs = dups.select(col("rep").as("id_a"), col("id").as("id_b"))
    val dupPairs = dups.select(col("rep"), col("id").as("id_a"))
      .join(dups.select(col("rep"), col("id").as("id_b")), "rep")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    repPairs.unionByName(dupPairs)
  }

  // ---------- shingles / jaccard ----------

  /** Word k-shingles of normalized text (codegen'd transform chain). */
  def wordShingles(textCol: Column, k: Int): Column = {
    val tokens = split(TextStats.normalize(textCol), " ")
    // sliding windows via transform over indexes; empty when < k tokens
    array_distinct(filter(
      transform(tokens, (_, i) =>
        when(i <= size(tokens) - k,
          array_join(slice(tokens, i + 1, lit(k)), " "))),
      x => x.isNotNull))
  }

  /** Exact Jaccard between two string arrays (set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(array_union(a, b))
    when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni)
  }

  // ---------- MinHash + LSH ----------

  /** MinHash signature of a shingle array: sig[i] = min over shingles of
    * xxhash64(shingle, i). One pass, pure `functions._` (transform +
    * array_min + hash-with-seed via concat), fully codegen.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      coalesce(
        array_min(transform(shingles, s => xxhash64(s, i))),
        lit(Long.MaxValue)))

  /** LSH band keys: split the signature into `bands` rows of
    * `numHashes/bands`, hash each band. Docs sharing any band key are
    * candidates (standard banding: P(candidate) = 1-(1-j^r)^b).
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"),
        xxhash64(array_join(
          transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
            x => x.cast("string")), ",")).as("bkey")))

  // deterministic seeded hash family parameters (odd multipliers)
  private lazy val hashFamily: Array[Long] = {
    val rnd = new scala.util.Random(0x5eed5eedL)
    Array.fill(256)(rnd.nextLong() | 1L)
  }

  /** Word k-shingle set in plain Scala (the typed fast path). */
  def shingleSet(text: String, k: Int): Array[String] = {
    if (text == null) return Array.empty
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < k) return Array.empty
    val set = new scala.collection.mutable.LinkedHashSet[String]
    var i = 0
    while (i + k <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      set += sb.toString
      i += 1
    }
    set.toArray
  }

  /** One-pass MinHash signature: one strong base hash per shingle, the
    * family derived by multiply-xorshift mixing — O(shingles x numHashes)
    * cheap long ops instead of numHashes string rehashes (the Catalyst
    * higher-order variant above is kept for SQL-surface parity but the
    * typed path is ~20x faster).
    */
  def minhashSig(shingles: Array[String], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val str = shingles(s)
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < str.length) { h ^= str.charAt(i); h *= 0x100000001b3L; i += 1 }
      var f = 0
      while (f < numHashes) {
        var v = h * hashFamily(f)
        v ^= (v >>> 33); v *= 0xff51afd7ed558ccdL; v ^= (v >>> 33)
        if (v < sig(f)) sig(f) = v
        f += 1
      }
      s += 1
    }
    sig
  }

  /** Band keys of a signature (band index mixed into the key). */
  private def bandKeyArray(sig: Array[Long], bands: Int,
      rowsPerBand: Int): Array[Long] =
    Array.tabulate(bands) { b =>
      var h = 0x9e3779b97f4a7c15L + b
      var r = 0
      while (r < rowsPerBand) {
        h ^= sig(b * rowsPerBand + r)
        h *= 0xff51afd7ed558ccdL
        r += 1
      }
      h
    }

  /** Near-duplicate pairs via MinHash LSH, verified with exact Jaccard.
    *
    * Pipeline (scale rules 1-4 above):
    * exact-collapse -> per-rep signatures -> (id, bandKey)-only banding
    * -> capped in-bucket candidate pairs -> shingle rejoin + exact
    * Jaccard verify on candidates -> member-pair expansion.
    *
    * At table scale, persist the collapsed representative table before
    * this call (it is scanned for signatures and again for the candidate
    * verify); at query scale the double scan is cheaper than a cache.
    *
    * @param maxBucket per-bucket candidate cap AFTER exact-collapse: an
    *                  oversized bucket contributes a deterministic
    *                  `maxBucket`-doc sample instead of vanishing; pass
    *                  `statsObs` to count capped buckets/docs
    */
  def minhashNearDups(
      df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucket: Int = 64,
      statsObs: Option[Observation] = None): DataFrame = {
    val rowsPerBand = numHashes / bands
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"),
      col(textCol).as("text"))

    // 1. exact-dup collapse (128-bit key: no false merges); the text
    // payload rides the collapse agg, so reps need no recovery join
    val (mapping, reps0) = collapse(
      base.select(col("id"), md5(TextStats.normalize(col("text"))).as("gk"),
        col("text").as("payload")))
    val reps = reps0.withColumnRenamed("payload", "text")

    // 2. banding: (id, bandKey) rows ONLY through the shuffle
    val banded = reps.as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val sh = shingleSet(text, shingleK)
        if (sh.isEmpty) Iterator.empty
        else {
          val sig = minhashSig(sh, numHashes)
          bandKeyArray(sig, bands, rowsPerBand).iterator.map(k => (id, k))
        }
      })
      .toDF("id", "bkey")

    // 3. capped candidate pairs between representatives
    val buckets = banded.groupBy("bkey").agg(collect_list(col("id")).as("ids"))
    val candPairs = bucketPairs(buckets, maxBucket, statsObs)

    // 4. exact verify: rejoin TEXTS by id (narrow), and only then — after
    // the join has filtered to actual candidates — expand to shingle
    // sets: projecting shingles before the join would ship every rep's
    // shingle array through the join shuffle (the r01 defect, moved).
    // candPairs is small, so AQE turns these into broadcast joins.
    val ta = reps.select(col("id").as("id_a"), col("text").as("_t_a"))
    val tb = reps.select(col("id").as("id_b"), col("text").as("_t_b"))
    val verified = candPairs
      .join(ta, "id_a").join(tb, "id_b")
      .withColumn("jaccard", round(jaccard(
        wordShingles(col("_t_a"), shingleK),
        wordShingles(col("_t_b"), shingleK)), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

    // 5. expansion: member pairs + internal pairs of exact groups
    //    (eligible = groups whose text yields >=1 shingle, matching the
    //    banding-stage gate; identical texts have Jaccard exactly 1.0)
    val eligible = banded.select(col("id").as("rep")).distinct()
    val internal = expandInternal(mapping, eligible)
      .withColumn("jaccard", lit(1.0))
    expandCross(verified, mapping, "jaccard").unionByName(internal)
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over word tokens: per-bit weighted vote of token
    * hashes. Implemented as a typed map (bit loops don't vectorize into
    * `functions._` cleanly); allocation-light per row.
    */
  def simhash64(tokens: Iterable[String]): Long = {
    val votes = new Array[Int](64)
    for (t <- tokens) {
      // FNV-1a 64 then mix — deterministic, dependency-free
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < t.length) { h ^= t.charAt(i); h *= 0x100000001b3L; i += 1 }
      h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** 5 chunks of the 64-bit signature: 13+13+13+13+12 bits. */
  private[operators] def simhashChunks(sig: Long): Array[Int] = Array(
    (sig & 0x1fff).toInt,
    ((sig >>> 13) & 0x1fff).toInt,
    ((sig >>> 26) & 0x1fff).toInt,
    ((sig >>> 39) & 0x1fff).toInt,
    ((sig >>> 52) & 0xfff).toInt)

  /** Multi-table bucket keys, Manku-style (Manku, Jain & Das Sarma,
    * "Detecting Near-Duplicates for Web Crawling", WWW 2007 — public
    * knowledge): one key per PAIR of chunks, C(5,2) = 10 tables, each
    * keyed on ~2^26 values (13+13 bits, table id in the high bits).
    * Hamming <= 3 flips touch at most 3 of the 5 chunks, leaving >= 2
    * clean chunks, so the pair of clean chunks collides in its table —
    * the recall guarantee of the old single-chunk pigeonhole is kept
    * while the per-table keyspace grows from 2^16 to ~2^26: at 10^9 docs
    * the expected bucket occupancy is ~15 per table instead of ~15000.
    */
  private[operators] def simhashPairKeys(sig: Long): Array[Long] = {
    val c = simhashChunks(sig)
    val out = new Array[Long](10)
    var t = 0
    var i = 0
    while (i < 4) {
      var j = i + 1
      while (j < 5) {
        out(t) = (t.toLong << 32) | (c(i).toLong << 13) | c(j).toLong
        t += 1
        j += 1
      }
      i += 1
    }
    out
  }

  /** SimHash near-dup pairs: multi-table chunk-pair keying (recall
    * guarantee for hamming <= 3, see [[simhashPairKeys]]), hamming
    * verified exactly on the candidate set. Same scale pipeline as
    * [[minhashNearDups]]: identical signatures (hamming 0) collapse to a
    * representative before keying — this collapse is semantically exact,
    * not a hash approximation — and expand back afterwards.
    */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      maxHamming: Int = 3, maxBucket: Int = 64,
                      statsObs: Option[Observation] = None): DataFrame = {
    require(maxHamming <= 3,
      "chunk-pair keying guarantees recall only for hamming <= 3 " +
        "(5 chunks - maxHamming flipped must leave >= 2 clean)")
    val spark = df.sparkSession
    import spark.implicits._
    val sigs = df.select(col(idCol).cast("long").as("id"),
        col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = if (text == null) Array.empty[String]
                   else text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        (id, simhash64(toks))
      }
      .toDF("id", "sig")

    // exact collapse on the full signature (hamming 0 — exact semantics;
    // the group key IS the payload, so reps fall out of the agg directly)
    val sigKeyed = sigs.select(col("id"), col("sig").as("gk"))
    val sigAgg = sigKeyed.groupBy("gk").agg(min("id").as("rep"))
    val mapping = sigAgg.join(sigKeyed, "gk").select("id", "rep")
    val reps = sigAgg.select(col("rep").as("id"), col("gk").as("sig"))

    // (id, tableKey) rows only through the shuffle
    val keyed = reps.as[(Long, Long)]
      .mapPartitions(_.flatMap { case (id, sig) =>
        simhashPairKeys(sig).iterator.map(k => (id, k))
      })
      .toDF("id", "bkey")
    val buckets = keyed.groupBy("bkey").agg(collect_list(col("id")).as("ids"))
    val candPairs = bucketPairs(buckets, maxBucket, statsObs)

    // exact hamming verify on candidates (sig rejoin by id)
    val sa = reps.select(col("id").as("id_a"), col("sig").as("_sig_a"))
    val sb = reps.select(col("id").as("id_b"), col("sig").as("_sig_b"))
    val verified = candPairs
      .join(sa, "id_a").join(sb, "id_b")
      .withColumn("hamming",
        bit_count(col("_sig_a").bitwiseXOR(col("_sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")

    // expansion: cross pairs inherit the reps' hamming exactly (identical
    // sig); internal pairs of a sig group have hamming 0
    val internal = expandInternal(mapping,
        reps.select(col("id").as("rep")))
      .withColumn("hamming", lit(0))
    expandCross(verified, mapping, "hamming").unionByName(internal)
  }
}
