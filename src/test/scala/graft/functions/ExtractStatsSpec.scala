package graft.functions

import graft.SparkTestSession
import graft.pipeline.{Transcripts, TurnExtractor}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity net for the serde-free stats expression: on every turn class
  * the generator emits (markup, HTML, prose, short) plus edge strings,
  * extract_stats must equal the ExtractedTurn metrics field-for-field.
  */
class ExtractStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def check(text: String): Unit = {
    val e = TurnExtractor.extract("c", 0, text)
    val r = spark.range(1).select(
        ExtractStats.extractStats(lit(text)).as("s"))
      .select("s.*").collect().head
    assert(r.getInt(0) == e.documents.size, s"n_docs for: $text")
    assert(r.getInt(1) == e.nParas, s"n_paras for: $text")
    assert(r.getInt(2) == e.extractedText.length, s"n_chars for: $text")
    assert(r.getLong(3) == e.nBytes, s"n_bytes for: $text")
    assert(r.getBoolean(4) == (e.error == null), s"ok for: $text")
  }

  test("parity with TurnExtractor on edge strings") {
    Seq("", " ", "one line", "a\nb\nc", "FIRST HEADER\nbody", "[TOC] x\ny",
      "^D FIRST\n^D body here", "#N(1,0) пункт\n#N(1,0) два",
      "|a|b|\n|c|d|", "**bold** run\nplain",
      "<html><body><p>hi there</p></body></html>",
      "а б в г", "\r\nwindows\r\nlines\r\n").foreach(check)
  }

  test("parity with TurnExtractor across generated turn classes") {
    val turns = Transcripts.generate(spark, 60).collect()
    assert(turns.length > 100)
    turns.foreach(t => check(t.text))
  }

  test("byte gate parity: CJK text under the char count but over the byte cap") {
    // 3.5M CJK chars = 10.5M UTF-8 bytes: passes a char-count gate,
    // fails the byte gate — both paths must agree on the BYTE decision
    // and report the byte count (VERDICT r03 #3)
    val cjk = "你" * 3500000
    val e = TurnExtractor.extract("c", 0, cjk)
    assert(e.error != null && e.error.contains("bytes"))
    assert(e.nBytes == 10500000L)
    val r = ExtractStats.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(cjk))
    assert(!r.getBoolean(4) && r.getLong(3) == 10500000L)
    // just under the cap on bytes: both paths extract normally
    val small = "你" * 3000000 // 9M bytes < 10M
    assert(TurnExtractor.extract("c", 0, small).error == null)
    assert(ExtractStats.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(small)).getBoolean(4))
  }

  test("null input, SQL surface, codegen") {
    import spark.implicits._
    ExtractStats.register(spark)
    Seq(Some("HEADER\nbody"), None).toDF("text")
      .createOrReplaceTempView("es_test")
    val got = spark.sql(
      "SELECT extract_stats(text).n_paras FROM es_test").collect()
      .map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).sorted
    assert(got.toSeq == Seq(-1, 1))
    val ranged = spark.range(8)
      .select(ExtractStats.extractStats(
        concat(lit("HEADER\nbody "), col("id"))).as("s"))
    assert(ranged.select("s.n_paras").collect().forall(_.getInt(0) == 1))
    assert(ranged.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }

  test("aggregate shape: one kernel run per row, map-side partials") {
    val df = Transcripts.generate(spark, 20).toDF()
      .select(ExtractStats.extractStats(col("text")).as("s"))
      .agg(count(lit(1)).as("n"), sum("s.n_bytes").as("bytes"),
        sum("s.n_paras").as("paras"))
    val r = df.collect().head
    val exp = Transcripts.generate(spark, 20).collect()
      .map(t => TurnExtractor.extract(t))
    assert(r.getLong(0) == exp.length)
    assert(r.getLong(1) == exp.map(_.nBytes).sum)
    assert(r.getLong(2) == exp.map(_.nParas.toLong).sum)
  }
}
