package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property suite per FIXTURES.md §5 — deterministic seeded generation
  * (seed fixed, no wall clock), 300 random turns per property.
  */
class SegmenterPropertySpec extends AnyFunSuite {

  test("SegBuilder chunk-list build == naive StringBuilder reference") {
    // safety net for the allocation rework: random addText sequences
    // must reproduce the reference separator-join rule exactly
    // (TextSegment.java:27-34), including mid-accumulation length /
    // blank reads and the lone-separator quirk on empty appends
    val rnd = new Random(0xBEEF)
    val pieces = Seq("", "a", "b\n", "\n", "  ", "тело", "x\ny", "\n\n", "zz ")
    for (_ <- 1 to 2000) {
      val init = pieces(rnd.nextInt(pieces.length))
      val sb = new SegBuilder(0, init)
      val ref = new StringBuilder(init)
      def refAdd(t: String): Unit = {
        if (ref.nonEmpty && !(ref.length >= 1 && ref.endsWith("\n"))) {
          ref ++= "\n"
        }
        ref ++= t
      }
      for (_ <- 0 until rnd.nextInt(6)) {
        val t = pieces(rnd.nextInt(pieces.length))
        sb.addText(t)
        refAdd(t)
        // interleaved reads must not disturb the accumulation — incl.
        // a full text build mid-sequence (the post-passes read .text of
        // a builder that may receive further appends)
        assert(sb.length == ref.length)
        assert(sb.isBlankTrim == ref.toString.trim.isEmpty)
        if (rnd.nextBoolean()) assert(sb.text == ref.toString)
      }
      assert(sb.text == ref.toString)
      assert(sb.length == ref.length)
      val seg = sb.toSeg
      assert(seg.text == ref.toString && seg.length == ref.length)
    }
  }

  private val ruWords = Vector("договор", "приложение", "протокол", "устав",
    "решение", "тело", "текст", "пункт", "раздел", "соглашение", "сторона")
  private val enWords = Vector("hello", "world", "clause", "section", "body",
    "agreement", "annex", "header", "content", "terms")

  private def genLine(rnd: Random): String = {
    val words = (0 until 1 + rnd.nextInt(6)).map { _ =>
      val w = if (rnd.nextBoolean()) ruWords(rnd.nextInt(ruWords.size))
              else enWords(rnd.nextInt(enWords.size))
      rnd.nextInt(4) match {
        case 0 => w.toUpperCase
        case 1 => s"**$w**"
        case _ => w
      }
    }
    val base = words.mkString(" ")
    rnd.nextInt(10) match {
      case 0 => s"^C $base"
      case 1 => s"^R $base"
      case 2 => s">>>> $base"
      case 3 => s"#N(${rnd.nextInt(3)},${rnd.nextInt(3)}) $base"
      case 4 => s"#B $base"
      case 5 => s"[TOC] $base"
      case 6 => ""
      case 7 => s"|$base|${enWords(rnd.nextInt(enWords.size))}|"
      case _ => base
    }
  }

  private def genTurn(rnd: Random): String =
    (0 until rnd.nextInt(20)).map(_ => genLine(rnd)).mkString("\n")

  private def forAllTurns(seed: Long, n: Int)(check: (String, MultiDoc) => Unit): Unit = {
    val rnd = new Random(seed)
    for (_ <- 0 until n) {
      val turn = genTurn(rnd)
      val md = Segmenter.segment(Tokenizer.tokenize(turn))
      check(turn, md)
    }
  }

  test("p1 determinism: segment(x) == segment(x)") {
    forAllTurns(42L, 300) { (turn, md) =>
      val again = Segmenter.segment(Tokenizer.tokenize(turn))
      assert(md == again, s"non-deterministic for:\n$turn")
    }
  }

  test("p2 segment invariants: length==text.length, offsets in range") {
    forAllTurns(43L, 300) { (turn, md) =>
      val total = turn.length + 16 // prefixes can only shrink markup text
      for (d <- md.documents; p <- d.paragraphs; s <- Seq(p.header, p.body)) {
        assert(s.length == s.text.length, s"len mismatch for:\n$turn")
        assert(s.offset >= -1 && s.offset <= total, s"offset oob for:\n$turn")
        if (s.offset == -1) assert(s.text.isEmpty)
      }
    }
  }

  test("p3 structural invariants: no empty docs, no blank headers") {
    forAllTurns(44L, 300) { (turn, md) =>
      for (d <- md.documents) {
        assert(d.paragraphs.nonEmpty, s"empty doc for:\n$turn")
        for (p <- d.paragraphs)
          assert(p.header.text.trim.nonEmpty, s"blank header for:\n$turn")
      }
    }
  }

  test("p4 no numbering placeholder leakage (%N) in output") {
    forAllTurns(45L, 300) { (turn, md) =>
      val txt = Segmenter.extractedText(md)
      assert(!"%\\d".r.findFirstIn(txt).isDefined, s"placeholder leak:\n$turn")
    }
  }

  test("p5 reassembly: non-markup plain turns reassemble exactly") {
    val rnd = new Random(46L)
    for (_ <- 0 until 300) {
      val lines = (0 until 1 + rnd.nextInt(12)).map { _ =>
        (0 until 1 + rnd.nextInt(5))
          .map(_ => enWords(rnd.nextInt(enWords.size))).mkString(" ")
      }
      val turn = lines.mkString("\n")
      val md = Segmenter.segment(Tokenizer.tokenize(turn))
      // plain lowercase lines: first becomes the header, rest join the body
      assert(Segmenter.extractedText(md) == turn)
    }
  }

  test("p7 kernel never throws on adversarial garbage (fuzz)") {
    val rnd = new Random(48L)
    val alphabet =
      "<>&|*#^[]()%.\\\"'{}/ \t\r\nабвгПРИЛдоговор формate токен0123**^C #N(1,0) [TOC] <p><script>"
    for (_ <- 0 until 500) {
      val len = rnd.nextInt(400)
      val sb = new StringBuilder
      for (_ <- 0 until len) sb.append(alphabet(rnd.nextInt(alphabet.length)))
      val turn = graft.pipeline.Turn("c", 0, "user", sb.toString, null, null)
      val out = graft.pipeline.TurnExtractor.extract(turn)
      assert(out.error == null, s"error on:\n${sb.toString}\n${out.error}")
    }
  }

  test("p6 doc type is always a known enum name") {
    val known = Set(DocType.UNKNOWN, DocType.CONTRACT, DocType.CHARTER,
      DocType.PROTOCOL, DocType.REGULATION, DocType.CHARITY_POLICY,
      DocType.ORDER, DocType.WORK_PLAN, DocType.SUPPLEMENTARY_AGREEMENT,
      DocType.ANNEX, DocType.AGREEMENT)
    forAllTurns(47L, 300) { (turn, md) =>
      for (d <- md.documents) assert(known.contains(d.docType))
    }
  }
}
