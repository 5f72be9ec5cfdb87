package graft.functions

import graft.SparkTestSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native MinhashSig must be BIT-IDENTICAL to the interpreted HOF
  * form it replaced — same XXH64, same seeds, same null contract —
  * otherwise LSH candidate recall silently changes.
  */
class MinhashSigSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("native signature == HOF signature on real shingle arrays") {
    val s = spark
    import s.implicits._
    val df = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "a completely different document about spark catalyst internals",
      "short one",
      "",
      "кириллический текст с юникодом и пробелами здесь тоже")
      .toDF("text")
      .withColumn("sh", Dedup.wordShingles(col("text"), 3))
    val both = df.select(
      Dedup.minhashSignature(col("sh"), 64).as("native"),
      Dedup.minhashSignatureHof(col("sh"), 64).as("hof"))
    val rows = both.collect()
    for (r <- rows)
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    // empty shingle array -> all-MaxValue on both
    val empty = rows(3)
    assert(empty.getSeq[Long](0).forall(_ == Long.MaxValue))
  }

  test("null shingle array matches the HOF coalesce (all MaxValue)") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1(null: String)).toDF("text")
      .select(lit(null).cast("array<string>").as("sh"))
    val r = df.select(
      Dedup.minhashSignature(col("sh"), 8).as("native"),
      Dedup.minhashSignatureHof(col("sh"), 8).as("hof")).collect().head
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(r.getSeq[Long](0).forall(_ == Long.MaxValue))
  }

  test("signature values are the raw xxhash64(shingle, seed) minima") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1(Seq("alpha beta", "gamma delta"))).toDF("sh")
    val expected = df.select(
      least(xxhash64(lit("alpha beta"), lit(0)),
        xxhash64(lit("gamma delta"), lit(0))).as("m0"),
      least(xxhash64(lit("alpha beta"), lit(1)),
        xxhash64(lit("gamma delta"), lit(1))).as("m1")).collect().head
    val got = df.select(Dedup.minhashSignature(col("sh"), 2))
      .collect().head.getSeq[Long](0)
    assert(got == Seq(expected.getLong(0), expected.getLong(1)))
  }
}
