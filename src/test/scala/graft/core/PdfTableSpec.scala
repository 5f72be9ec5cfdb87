package graft.core

import org.scalatest.funsuite.AnyFunSuite
import PdfTable._

/** Synthetic-geometry fixtures p01-p08 (FIXTURES.md §4). Page space is
  * PDF user space: y grows upward.
  */
class PdfTableSpec extends AnyFunSuite {

  private val W = 600f // page width

  /** A 3x2 grid: horizontals at y=700(top),600,500(bottom); verticals at
    * x=10,300,590. All >=90% of extent.
    */
  private def gridRects: Seq[Rect] = Seq(
    Rect(10, 700, 580, 1), Rect(10, 600, 580, 1), Rect(10, 500, 580, 1),
    Rect(10, 500, 1, 200), Rect(300, 500, 1, 200), Rect(589, 500, 1, 200))

  private def glyphLine(y: Float, x0: Float, s: String): GlyphLine =
    GlyphLine(s.zipWithIndex.map { case (c, i) =>
      Glyph(x0 + i * 5, y, c.toString) })

  test("p01 orientation split; thin-both rects land in both lists") {
    val (h, v) = splitOrientation(Seq(
      Rect(0, 0, 100, 1), Rect(0, 0, 1, 100), Rect(0, 0, 5, 5)))
    assert(h.map(_.w) == Seq(100f, 5f))
    assert(v.map(_.h) == Seq(100f, 5f))
  }

  test("p02 collinear merge with gap < 1.0, containment dedupe") {
    val merged = concatenateHorizontals(Seq(
      Rect(0, 10, 100, 1), Rect(100.5f, 10, 100, 1), Rect(50, 10, 10, 1)))
    assert(merged.size == 1)
    assert(math.abs(merged.head.w - 200.5f) < 1e-3)
    val apart = concatenateHorizontals(Seq(
      Rect(0, 10, 100, 1), Rect(102, 10, 100, 1)))
    assert(apart.size == 2)
    val vert = concatenateVerticals(Seq(
      Rect(10, 0, 1, 50), Rect(10, 50.5f, 1, 50)))
    assert(vert.size == 1 && math.abs(vert.head.h - 100.5f) < 1e-3)
  }

  test("p03 grid filters: 90% width / 90% max height; sort order") {
    val (h, v) = selectGrid(
      Seq(Rect(10, 700, 580, 1), Rect(10, 600, 100, 1)), // short dropped
      Seq(Rect(10, 500, 1, 200), Rect(300, 500, 1, 20)), // short dropped
      W)
    assert(h.map(_.y) == Seq(700f))
    assert(v.map(_.x) == Seq(10f))
  }

  test("p04 border synthesis adds missing top/bottom") {
    val h = Seq(Rect(10, 600, 580, 1)) // only a middle line
    val v = Seq(Rect(10, 500, 1, 200), Rect(589, 500, 1, 200))
    val out = addBorderLines(h, v)
    assert(out.size == 3)
    assert(out.head.y == 700f) // synthesized top at avg max-y
    assert(out.last.y == 500f) // synthesized bottom at avg min-y
  }

  test("p05 cell glyph assignment") {
    val lines = Seq(
      glyphLine(650, 20, "AB"), glyphLine(650, 310, "CD"),
      glyphLine(550, 20, "EF"), glyphLine(550, 310, "GH"))
    val table = tableFromPage(Page("", lines, gridRects), W)
    assert(table.map(_.toSeq).toSeq == Seq(Seq("AB", "CD"), Seq("EF", "GH")))
  }

  test("p06 cross-page stitch: blank first cell merges, else flushes") {
    val header = "Полное фирменное наименование | Основание | Дата наступления основания | Доля участия"
    // page 1: header row, then a data row (held back as last row)
    val p1lines = Seq(
      glyphLine(650, 20, "Полное фирменное наименование"),
      glyphLine(650, 310, "Доля участия"),
      glyphLine(550, 20, "ООО Ромашка"), glyphLine(550, 310, "50,5"))
    val p1 = Page(startPagePattern, p1lines, gridRects)
    // page 2: first row blank in col0 -> merged with held-back row
    val p2lines = Seq(
      glyphLine(650, 310, "1"), // col0 blank; col1 continuation
      glyphLine(550, 20, "АО Лютик"), glyphLine(550, 310, "25"))
    val p2 = Page("", p2lines, gridRects)
    val out = parseStakeholderPages(Seq(p1, p2), W)
    // header discovery consumed page1 row0 and skipped the next row; the
    // held-back row от page1 merged into page2 row0
    assert(out.map(_.name).contains("ООО Ромашка"))
    val rom = out.find(_.name == "ООО Ромашка").get
    assert(rom.share == BigDecimal("50.51")) // "50,5" ++ "1": merge concatenates
    assert(out.last.name == "АО Лютик")
    assert(out.last.share == BigDecimal(25))
  }

  test("p07 page gates: start pattern begins, end pattern stops") {
    val data = Seq(glyphLine(650, 20, "X"), glyphLine(550, 20, "Y"))
    val before = Page("intro", data, gridRects)
    val stop = Page(endPagePattern, data, gridRects)
    val out = parseStakeholderPages(Seq(before, stop), W)
    assert(out.isEmpty) // never found start pattern
  }

  test("p08 scalar parses: reasons, dates, share") {
    assert(splitReason("1.первое 2.второе") == Seq("первое ", "второе"))
    assert(splitReason("одно. другое") == Seq("одно", " другое"))
    assert(splitDates("с 01.02.2020 по 15.12.2021") ==
      Seq("01.02.2020", "15.12.2021"))
    assert(parseShare("доля 12,75 процента") == Some(BigDecimal("12.75")))
    assert(parseShare("нет числа") == None)
    val st = Stakeholder()
    processCell(-1, 0, 1, -1, st, 0, Array("1.осн один 2.осн два", ""))
    processCell(-1, 0, 1, -1, st, 1, Array("", "01.01.2020 02.02.2021"))
    assert(st.reasons.size == 2)
    assert(st.reasons(0).date == java.time.LocalDate.of(2020, 1, 1))
    assert(st.reasons(1).date == java.time.LocalDate.of(2021, 2, 2))
  }
}
