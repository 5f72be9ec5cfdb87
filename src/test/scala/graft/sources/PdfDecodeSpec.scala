package graft.sources

import graft.core.PdfTable
import org.scalatest.funsuite.AnyFunSuite

/** Real-decode net for the PDF tokenizer: synthesized valid PDFs in,
  * kernel Pages out, the full stakeholder geometry pipeline (P2-P8)
  * running on decoded bytes.
  */
class PdfDecodeSpec extends AnyFunSuite {

  test("content interpreter: text positioning, TJ adjustments, fill " +
    "harvest vs stroked paths") {
    val c = new PdfSynth.Content
    c.text(100f, 500f, 10f, "AB")
    c.fillRect(10f, 20f, 100f, 1f)
    val bytes = PdfSynth.pdf(Seq(c))
    val page = PdfDecode.pages(bytes).head
    assert(page.rects == Seq(PdfTable.Rect(10f, 20f, 100f, 1f)))
    val gs = page.lines.head.glyphs
    assert(gs.map(_.text) == Seq("A", "B"))
    assert(gs(0).x == 100f && gs(1).x == 105f && gs(0).y == 500f)
    // stroked rect is NOT harvested (fill-path rule, LineCatcher)
    val raw = ("BT /F1 10 Tf 5 5 Td (x) Tj ET\n" +
      "1 2 3 4 re S\n5 6 7 8 re f\n").getBytes("UTF-8")
    val p2 = PdfDecode.interpret(raw)
    assert(p2.rects == Seq(PdfTable.Rect(5f, 6f, 7f, 8f)))
    // TJ adjustment moves x
    val p3 = PdfDecode.interpret(
      "BT /F1 10 Tf 0 0 Td [(A) -200 (B)] TJ ET".getBytes("UTF-8"))
    val g3 = p3.lines.head.glyphs
    assert(g3(1).x == 5f + 2f, g3.toString) // 0.5*10 advance + 200/1000*10
  }

  test("flate and plain streams decode identically; objects + page walk") {
    val plain = PdfSynth.stakeholderPdf(1, compress = false)
    val flate = PdfSynth.stakeholderPdf(1, compress = true)
    val a = PdfDecode.pages(plain)
    val b = PdfDecode.pages(flate)
    assert(a == b, "compression must not change decoded pages")
    assert(a.size == 3)
    assert(a.head.text.contains(PdfTable.startPagePattern))
    assert(a.last.text.contains(PdfTable.endPagePattern))
    assert(PdfDecode.pageWidth(plain) == 612f)
  }

  test("q64 stakeholder filing decodes to the closed-form 9 rows " +
    "(titles, skip-row quirk, cross-page stitch, end-page stop)") {
    val i = 4
    val pages = PdfDecode.pages(OoxmlCorpus.pdfBytes(i))
    val sts = PdfTable.parseStakeholderPages(pages, 612f)
    assert(sts.size == 9, sts.map(_.name))
    assert(sts(0).name == s"ООО Компания $i 0")
    assert(sts(0).share == BigDecimal("25.0"))
    assert(sts(0).reasons.map(_.text).toSeq ==
      Seq("создание общества ", "приобретение акций"))
    assert(sts(0).reasons.map(_.date.toString).toSeq ==
      Seq("2020-02-01", "2021-04-03"))
    assert(sts(2).share == BigDecimal("25.2"))
    // the stitched cross-page stakeholder (P7)
    assert(sts(3).name == s"ООО Гамма $i")
    assert(sts(3).reasons.map(_.text).toSeq ==
      Seq("создание ", "продажа акций"))
    assert(sts(3).share == BigDecimal("10"))
    assert(sts(4).name == s"АО Дельта $i 3")
    assert(sts(4).reasons.map(_.text).toSeq == Seq("владение долей"))
    assert(sts(7).share == BigDecimal("6.5"))
    // the end-of-pages flush of the held row
    assert(sts(8).name == s"ПАО Омега $i")
    assert(sts(8).reasons.map(_.date.toString).toSeq == Seq("2019-12-31"))
    assert(sts(8).share == BigDecimal("100"))
  }
}
