package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for large-scale training-data pipelines.
  * Everything here is built from `org.apache.spark.sql.functions._` so it
  * stays inside whole-stage codegen (no UDFs in the hot path) and pushes
  * through Catalyst untouched.
  */
object TextStats {

  /** Whitespace token count (count of maximal non-\s runs); blank -> 0.
    * Full \s trim first — Spark's `trim` strips spaces only, which would
    * leave a trailing "\n" producing a phantom empty token. Identical
    * semantics to the native [[graft.functions.TokenCount]] expression.
    */
  def tokenCount(c: Column): Column = {
    val trimmed = regexp_replace(c, "^\\s+|\\s+$", "")
    when(length(trimmed) === 0, lit(0))
      .otherwise(size(split(trimmed, "\\s+")))
  }

  /** Characters matching a class, via strip-and-measure (codegen'd). */
  def charsMatching(c: Column, charClassRegex: String): Column =
    length(c) - length(regexp_replace(c, charClassRegex, ""))

  def cyrillicChars(c: Column): Column = charsMatching(c, "[а-яА-ЯёЁ]")
  def latinChars(c: Column): Column = charsMatching(c, "[a-zA-Z]")
  def digitChars(c: Column): Column = charsMatching(c, "[0-9]")

  /** Cheap script-based language id (SQL-expressible tier; the n-gram
    * tier lives in [[LangId]]).
    */
  def langIdScript(c: Column): Column =
    when(cyrillicChars(c) > latinChars(c), lit("ru"))
      .when(latinChars(c) > 0, lit("en"))
      .otherwise(lit("unknown"))

  /** Shallow quality features (length / punctuation / token shape) —
    * the standard pre-training quality gates.
    */
  def alphaRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise((cyrillicChars(c) + latinChars(c)).cast("double") / length(c))

  def digitRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(digitChars(c).cast("double") / length(c))

  def avgTokenLen(c: Column): Column =
    when(tokenCount(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(trim(c), "\\s+", "")).cast("double")
        / tokenCount(c))

  /** Composite quality score in [0,1]: high alpha share, sane token
    * length, low digit noise.
    */
  def qualityScore(c: Column): Column = {
    val alpha = alphaRatio(c)
    val digits = digitRatio(c)
    val tokLen = avgTokenLen(c)
    val lenOk = when(tokLen >= 3 && tokLen <= 12, lit(1.0)).otherwise(lit(0.5))
    round(greatest(lit(0.0), least(lit(1.0),
      alpha * lenOk * (lit(1.0) - digits * 2))), 4)
  }

  /** 128-bit exact-dup fingerprint of normalized text (md5 hex — the
    * same "no false merges" discipline as [[Dedup.collapse]]'s group
    * key, `Dedup.scala` step 1). 64 bits is NOT enough for a public
    * drop surface: at 10^10–10^11 docs the birthday bound on xxhash64
    * gives ~3–300 expected collisions, each of which silently drops a
    * NON-duplicate document. At 128 bits the expected collision count
    * at 10^11 docs is ~1.5e-17 — every consumer
    * ([[Dedup.exactDupGroups]], [[Dedup.dropExactDups]],
    * [[graft.streaming.StreamExtract.dedupStream]]) inherits the
    * no-false-merge guarantee. Stable across Spark versions and
    * executors (md5 of UTF-8 bytes).
    */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** Dedup normalization: lowercase, collapse whitespace, trim. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))
}
