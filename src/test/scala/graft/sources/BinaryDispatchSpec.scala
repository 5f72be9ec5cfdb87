package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class BinaryDispatchSpec extends AnyFunSuite {

  test("content-magic sniff routes every synthesized format correctly") {
    assert(BinaryDispatch.sniff(OoxmlCorpus.docxBytes(1)) == "docx")
    assert(BinaryDispatch.sniff(OoxmlCorpus.xlsxBytes(1)) == "xlsx")
    assert(BinaryDispatch.sniff(OoxmlCorpus.docBytes62(1)) == "doc")
    assert(BinaryDispatch.sniff(OoxmlCorpus.xlsBytes(1)) == "xls")
    assert(BinaryDispatch.sniff(OoxmlCorpus.pdfBytes(1)) == "pdf")
    assert(BinaryDispatch.sniff("just a plain transcript".getBytes) == "text")
    // a CFB that is neither Word nor Excel stays unrouted, not misrouted
    assert(BinaryDispatch.sniff(
      DocSynth.cfb(Seq("Other" -> new Array[Byte](4096)))) == "cfb")
  }

  test("decode() returns the right shape per format") {
    import BinaryDispatch._
    assert(decode(OoxmlCorpus.docxBytes(2))
      .asInstanceOf[DecodedDoc].md.documents.nonEmpty)
    assert(decode(OoxmlCorpus.docBytes62(2))
      .asInstanceOf[DecodedDoc].md.documents.head.paragraphs.size == 4)
    assert(decode(OoxmlCorpus.xlsBytes(2))
      .asInstanceOf[DecodedSheets]
      .sheets.head.rows.size == 6) // 3 STRING + 1 FORMULA + 2 RK/MulRk
    assert(decode(OoxmlCorpus.pdfBytes(2))
      .asInstanceOf[DecodedPdf].stakeholders.size == 9)
    assert(decode("plain".getBytes)
      .asInstanceOf[DecodedText].text == "plain")
  }
}
