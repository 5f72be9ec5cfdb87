package graft.sources

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Real-decode net for the MS-DOC (OLE2/CFB + Word97) tokenizer:
  * synthesized byte-stable .doc containers in, DOC-dialect Element
  * streams out, segmented by the same A1 fold as the `^D` fixtures.
  */
class DocDecodeSpec extends AnyFunSuite {

  import DocSynth.DocP

  test("cfb round-trip: streams come back byte-exact") {
    val payload = Array.tabulate[Byte](5000)(i => (i % 251).toByte)
    val bytes = DocSynth.cfb(Seq("Alpha" -> payload, "Beta" -> payload))
    val streams = CfbDecode.streams(bytes)
    assert(streams.keySet == Set("Alpha", "Beta"))
    // content padded to the mini cutoff; the original prefix is intact
    assert(streams("Alpha").take(5000).sameElements(payload))
    // byte-stable: same spec, same bytes
    assert(bytes.sameElements(
      DocSynth.cfb(Seq("Alpha" -> payload, "Beta" -> payload))))
  }

  test("cfb reader rejects garbage and cyclic chains") {
    intercept[IllegalArgumentException] {
      CfbDecode.streams("not a cfb at all, definitely".getBytes)
    }
    val good = DocSynth.cfb(Seq("S" -> new Array[Byte](4096)))
    // corrupt the FAT so the stream chain points at itself -> must
    // terminate with an error, not loop
    val bad = good.clone()
    // FAT sector 0 begins at offset 512; stream start sector is 2
    // (fat, dir, stream); make fat[2] = 2 (self-cycle)
    java.nio.ByteBuffer.wrap(bad, 512 + 8, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(2)
    intercept[IllegalArgumentException] { CfbDecode.streams(bad) }
  }

  test("doc decode: text, runs, bold, justification, indent reach the " +
    "Element stream as DOC dialect") {
    val bytes = DocSynth.doc(Seq(
      DocP("TITLE LINE", bold = true),
      DocP("plain body"),
      DocP("Centered line", jc = 1),
      DocP("indented line", dxaLeft = 4000),
      DocP("after break", pageBreakBefore = true)))
    val els = DocDecode.docBodyElements(bytes)
      .collect { case ParaElement(e) => e }
    assert(els.size == 5)
    assert(els.forall(_.docDialect), "DOC dialect flag on every element")
    assert(els(0).text == "TITLE LINE")
    assert(els(0).runs == Seq(Run("TITLE LINE", Some(true))))
    assert(els(1).runs.head.bold.isEmpty, "no CHPX -> bold unset")
    assert(els(2).justification == 1)
    assert(els(3).indentRatio > 0.25f)
    assert(els(4).canBeHeader.contains(CanBeHeader.Must))
  }

  test("q62 document shape segments to the closed-form expectation " +
    "(incl. the :179 unconditional leading-space quirk and the r05 " +
    "list/SEP tier)") {
    val i = 5
    val md = DocDecode.decodeDoc(OoxmlCorpus.docBytes62(i))
    assert(md.documents.size == 1)
    val paras = md.documents.head.paragraphs
    assert(paras.size == 4, paras.map(p => (p.header.text, p.body.text)))
    assert(paras(0).header.text == s" AGREEMENT $i TITLE")
    assert(paras(0).body.text == s" agreement body text number $i lorem")
    assert(paras(1).header.text == s" Section $i details")
    assert(paras(1).body.text == s" closing details for document $i")
    assert(paras(2).header.text == s" indented note $i")
    // list items: the reference's DOC root-seeding off-by-one numbers
    // the first level-0 item "2." (DocumentParser.java:145-166); the
    // final dxaLeft=4000 note stays body only because the REAL page
    // width (sprmSXaPage 20000) is decoded. The table tier follows:
    // multi-cell rows are CanNot-demoted into this body (5 cell
    // paragraphs), then the single-cell bold row promotes to the next
    // paragraph's header
    assert(paras(2).body.text ==
      s" final remark $i\n2. первый пункт $i\n3. второй пункт $i\n" +
      s"3.1. подпункт $i\n• маркер $i\n wide indent note $i\n" +
      s" продавец $i\n покупатель $i\n адрес $i\n город $i\n регион $i")
    assert(paras(3).header.text == s" APPENDIX $i TERMS")
    assert(paras(3).body.text == s" итог $i\n сумма $i")
  }

  test("real table bytes reassemble to TableElement rows -> cells -> " +
    "paragraphs (fInTable/fTtp + 0x07 marks)") {
    val els = DocDecode.docBodyElements(OoxmlCorpus.docBytes62(3))
    val tables = els.collect { case t: TableElement => t }
    assert(tables.size == 1, "one flushed table")
    val rows = tables.head.rows
    def cellTexts(c: Seq[BodyElement]): Seq[String] =
      c.collect { case ParaElement(e) => e.text }
    assert(rows.map(_.map(cellTexts)) == Seq(
      Seq(Seq("продавец 3"), Seq("покупатель 3")),
      Seq(Seq("адрес 3", "город 3"), Seq("регион 3")),
      Seq(Seq("APPENDIX 3 TERMS")),
      Seq(Seq("итог 3"), Seq("сумма 3"))))
    // the promoted cell keeps its CHPX bold run; every cell paragraph
    // carries the DOC dialect flag
    val cellEls = rows.flatten.flatten.collect { case ParaElement(e) => e }
    assert(cellEls.find(_.text == "APPENDIX 3 TERMS")
      .get.runs.head.bold.contains(true))
    assert(cellEls.forall(_.docDialect))
    // the table sits after the 11 plain paragraphs, nothing trails it
    assert(els.indexWhere(_.isInstanceOf[TableElement]) == 11 &&
      els.size == 12)
  }

  test("PlfLst/PlfLfo: listRef reaches the Element stream with the " +
    "full level table") {
    val els = DocDecode.docBodyElements(OoxmlCorpus.docBytes62(0))
      .collect { case ParaElement(e) => e }
    assert(els.size == 11)
    val lr = els(6).listRef.get
    assert(lr.listId == 100 && lr.ilvl == 0 && lr.numFmt == "decimal")
    assert(lr.docLevels.head == DocLevel(1, 0, "\u0000."))
    assert(lr.docLevels(1) == DocLevel(1, 0, "\u0000.\u0001."))
    assert(els(8).listRef.get.ilvl == 1)
    assert(els(9).listRef.get.numFmt == "bullet")
    assert(els(10).listRef.isEmpty)
    // SEP page width: dxaLeft=4000 over xaPage=20000
    assert(math.abs(els(10).indentRatio - 0.2f) < 1e-6)
  }

  test("many-piece piece table: alternating cp1252/UTF-16 pieces " +
    "decode to the same text, in linear-ish time") {
    val paras = (0 until 15).map(k =>
      DocP(s"paragraph $k body text with enough words to span pieces"))
    val onePiece = DocSynth.doc(paras)
    val manyPieces = DocSynth.doc(paras, pieceChars = 7)
    val a = DocDecode.docBodyElements(onePiece)
      .collect { case ParaElement(e) => e }
    val b = DocDecode.docBodyElements(manyPieces)
      .collect { case ParaElement(e) => e }
    assert(a.map(_.text) == b.map(_.text))
    // piece count really is large (ceil(len/7))
    val totalChars = paras.map(_.text.length + 1).sum
    assert(totalChars / 7 > 100)
    // coarse nonlinearity probe: 16x the text through 4x the pieces
    // must not cost ~16x^2; wall-clock is noisy on a shared box, so
    // just assert it completes fast in absolute terms
    val big = (0 until 120).map(k => DocP(s"linear probe para $k with " +
      "a reasonably long body sentence to build volume quickly"))
    val bigBytes = DocSynth.doc(big, pieceChars = 7)
    val t0 = System.nanoTime()
    DocDecode.docBodyElements(bigBytes)
    assert((System.nanoTime() - t0) < 2e9, "many-piece decode too slow")
  }

  test("unicode piece: UTF-16 text pieces decode (the fCompressed=0 path)") {
    // cp1252 guard rejects non-latin unless the unicode piece is used
    intercept[IllegalArgumentException] {
      DocSynth.doc(Seq(DocP("кириллица")))
    }
    val bytes = DocSynth.doc(Seq(
      DocP("ЗАГОЛОВОК ДОКУМЕНТА", bold = true),
      DocP("обычный текст тела")), unicode = true)
    val els = DocDecode.docBodyElements(bytes)
      .collect { case ParaElement(e) => e }
    assert(els.map(_.text) ==
      Seq("ЗАГОЛОВОК ДОКУМЕНТА", "обычный текст тела"))
    assert(els(0).runs == Seq(Run("ЗАГОЛОВОК ДОКУМЕНТА", Some(true))))
    // and the Cyrillic caps header routes through the DOC predicate
    val md = DocDecode.decodeDoc(bytes)
    assert(md.documents.head.paragraphs.head.header.text ==
      " ЗАГОЛОВОК ДОКУМЕНТА")
  }
}
