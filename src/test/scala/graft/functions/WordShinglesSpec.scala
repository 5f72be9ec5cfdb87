package graft.functions

import graft.SparkTestSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native WordShingles must produce BYTE-IDENTICAL shingle arrays
  * to the HOF form it replaced — the strings feed md5 keys the DuckDB
  * oracles recompute.
  */
class WordShinglesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("native shingles == HOF shingles, order included") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "The Quick  brown\tFOX jumps over the quick brown fox",
      "a b c d e",
      "too short",
      "",
      "   ",
      "кириллица и юникод работают одинаково в обоих вариантах",
      "repeat repeat repeat repeat repeat",
      null)
    for (k <- Seq(1, 2, 3, 8)) {
      val both = texts.toDF("text").select(
        Dedup.wordShingles(col("text"), k).as("native"),
        Dedup.wordShinglesHof(col("text"), k).as("hof"))
      for ((r, t) <- both.collect().zip(texts)) {
        assert(r.isNullAt(0) == r.isNullAt(1), s"null parity for '$t' k=$k")
        if (!r.isNullAt(0))
          assert(r.getSeq[String](0) == r.getSeq[String](1),
            s"shingle parity for '$t' k=$k")
      }
    }
  }

  test("distinctness keeps first occurrence; < k tokens is empty") {
    val s = spark
    import s.implicits._
    val r = Seq("x y x y x y").toDF("text")
      .select(Dedup.wordShingles(col("text"), 2)).collect().head
    assert(r.getSeq[String](0) == Seq("x y", "y x"))
    val short = Seq("one two").toDF("text")
      .select(Dedup.wordShingles(col("text"), 3)).collect().head
    assert(short.getSeq[String](0).isEmpty)
  }
}
