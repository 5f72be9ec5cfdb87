package graft.sources

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Real-decode net for the JDK-only OOXML tokenizers (VERDICT r03 #3):
  * synthesized byte-stable containers in, segmenter-contract elements
  * out, with the reference's style/bold/numbering quirks pinned.
  */
class OoxmlDecodeSpec extends AnyFunSuite {

  import OoxmlSynth.{P, Tbl}

  test("zip round-trip is byte-stable and entry-complete") {
    val b1 = OoxmlSynth.docx(Seq(P.plain("hello")))
    val b2 = OoxmlSynth.docx(Seq(P.plain("hello")))
    assert(b1.sameElements(b2), "same spec must give identical bytes")
    val entries = OoxmlDecode.zipEntries(b1)
    assert(entries.contains("word/document.xml"))
    assert(entries.contains("word/styles.xml"))
    assert(entries.contains("word/numbering.xml"))
  }

  test("style bold resolution: explicit, basedOn recursion, no-rPr quirk") {
    val entries = OoxmlDecode.zipEntries(OoxmlSynth.docx(Seq(P.plain("x"))))
    val styles = OoxmlDecode.parseStyles(entries("word/styles.xml"))
    assert(OoxmlDecode.resolveBold(styles, "Head1"), "explicit w:b")
    assert(OoxmlDecode.resolveBold(styles, "Derived1"),
      "rPr present, b unset -> basedOn recursion finds bold")
    // the reference's isBold(document, styleID) returns false WITHOUT
    // consulting basedOn when the style has no rPr at all
    // (DocumentParser.java:949-966)
    assert(!OoxmlDecode.resolveBold(styles, "NoRpr"), "no rPr -> false")
    assert(!OoxmlDecode.resolveBold(styles, "Plain1"), "b w:val=0 -> false")
    assert(!OoxmlDecode.resolveBold(styles, "Missing1"), "unknown style")
  }

  test("numbering: numId -> abstractNum level (numFmt, lvlText, start)") {
    val entries = OoxmlDecode.zipEntries(OoxmlSynth.docx(Seq(P.plain("x"))))
    val num = OoxmlDecode.parseNumbering(entries.get("word/numbering.xml"))
    val l0 = num.listRef(1, 0)
    assert(l0 == ListRef(0, 0, "decimal", "%1.", 1))
    val l1 = num.listRef(1, 1)
    assert(l1 == ListRef(0, 1, "decimal", "%1.%2.", 1))
    // unmapped numId falls back to itself as the list key (the
    // reference's abstractNumId-null path, DocumentParser.java:539-546)
    assert(num.listRef(9, 0).listId == 9)
  }

  test("document decode: attributes reach the Element stream") {
    val bytes = OoxmlSynth.docx(Seq(
      P(Seq("TITLE" -> Some(true))),
      P.plain("plain body text"),
      P(Seq("centered" -> None), center = true),
      P(Seq("styled" -> None), style = "Head1"),
      P(Seq("indented" -> None), indentLeft = 4000), // 4000/12240 > 0.25
      P(Seq("item one" -> None), numId = 1),
      P(Seq("Contents line" -> None), toc = true),
      P(Seq("after break" -> None), pageBreakBefore = true),
      Tbl(Seq(Seq("a1", "b1"), Seq("a2", "b2")))))
    val els = OoxmlDecode.docxBodyElements(bytes)
    assert(els.size == 9)
    val ps = els.collect { case ParaElement(e) => e }
    assert(ps(0).runs == Seq(Run("TITLE", Some(true))))
    assert(ps(1).text == "plain body text" && ps(1).runs.head.bold.isEmpty)
    assert(ps(2).align == Align.Center)
    assert(ps(3).styleBoldChain == Seq(true), "pStyle joins the chain")
    assert(ps(4).indentRatio > 0.25f && ps(4).indentRatio < 0.4f)
    assert(ps(5).listRef.contains(ListRef(0, 0, "decimal", "%1.", 1)))
    assert(ps(6).isToc, "PAGEREF _Toc field")
    assert(ps(7).canBeHeader.contains(CanBeHeader.Must), "page break")
    val tbl = els.collect { case t: TableElement => t }.head
    assert(tbl.rows.size == 2 && tbl.rows.head.size == 2)
    assert(tbl.rows.head.head.head.asInstanceOf[ParaElement].el.text == "a1")
  }

  test("nested tables decode as nested TableElements and segment via " +
    "the reference's recursion (cell body streams, :446-447)") {
    import OoxmlSynth.TblRich
    val bytes = OoxmlSynth.docx(Seq(
      P(Seq("DOC TITLE" -> Some(true))),
      P.plain("body one"),
      TblRich(Seq(Seq(Seq(
        P.plain("intro"),
        Tbl(Seq(Seq("n1", "n2"), Seq("n3", "n4")), style = "TStyle"),
        P.plain("outro")))))))
    val els = OoxmlDecode.docxBodyElements(bytes)
    val outer = els.collect { case t: TableElement => t }.head
    val cell = outer.rows.head.head
    assert(cell.size == 3, "para + nested table + para, in order")
    val inner = cell(1).asInstanceOf[TableElement]
    assert(inner.rows.map(_.map(_.collect {
      case ParaElement(e) => e.text
    })) == Seq(Seq(Seq("n1"), Seq("n2")), Seq(Seq("n3"), Seq("n4"))))
    // the nested table's style joins the chain of ITS cell paragraphs
    assert(inner.rows.head.head.head.asInstanceOf[ParaElement]
      .el.styleBoldChain.size == 1)
    // segmentation: the single-cell outer row gates Can, the 2-cell
    // inner rows gate CanNot -> everything lands in the body
    val md = OoxmlDecode.decodeDocx(bytes)
    val paras = md.documents.head.paragraphs
    assert(paras.size == 1)
    assert(paras.head.header.text == "DOC TITLE")
    assert(paras.head.body.text ==
      "body one\nintro\nn1\nn2\nn3\nn4\noutro")
  }

  test("q58 document shape segments to the closed-form expectation") {
    val i = 7
    val bytes = OoxmlCorpus.docxBytes(i)
    val md = OoxmlDecode.decodeDocx(bytes)
    assert(md.documents.size == 1)
    val paras = md.documents.head.paragraphs
    assert(paras.size == 2, paras.map(p => (p.header.text, p.body.text)))
    assert(paras(0).header.text == s"AGREEMENT DOCUMENT $i")
    assert(paras(0).body.text ==
      s"This agreement number $i is made between the parties.")
    assert(paras(1).header.text == s"SECTION $i OVERVIEW")
    assert(paras(1).body.text ==
      s"Terms and conditions follow for document $i.\n" +
      s"1. first term of document $i\n2. second term of document $i\n" +
      s"alpha $i\nbeta $i\ngamma $i\ndelta $i\nsigned at location $i\n" +
      s"approved clause $i final")
    // embedded-object parity: the text-box content appears NOWHERE —
    // a non-skipping reader would emit it twice (Choice + Fallback) —
    // and the BLOCK content control is dropped whole (the reference's
    // CONTENTCONTROL early-out) while the INLINE one above is included
    val all = paras.map(p => p.header.text + "\n" + p.body.text).mkString
    assert(!all.contains("STAMP BOX"))
    assert(!all.contains("CONTROLLED COVER"))
  }

  test("content controls: block-level w:sdt drops whole (reference " +
      "CONTENTCONTROL early-out), inline w:sdt text is included") {
    import OoxmlSynth.{SdtBlock, InlineSdtP}
    val bytes = OoxmlSynth.docx(Seq(
      P(Seq("TITLE HEAD" -> Some(true))),
      SdtBlock(Seq(P.plain("dropped one"), P.plain("dropped two"))),
      InlineSdtP("kept ", "inline", " tail"),
      SdtBlock(Seq(P.plain("dropped three")))))
    val md = OoxmlDecode.decodeDocx(bytes)
    val paras = md.documents.head.paragraphs
    assert(paras.size == 1, paras.map(p => (p.header.text, p.body.text)))
    assert(paras(0).header.text == "TITLE HEAD")
    assert(paras(0).body.text == "kept inline tail")
  }

  test("ECMA-376 STRICT namespaces decode identically to transitional " +
    "(hand-rewritten container, the namespace-lenient StAX gate)") {
    // Office 2013+ "Strict Open XML" documents carry purl.oclc.org
    // namespace URIs instead of schemas.openxmlformats.org (ISO 29500-1
    // strict vs transitional). The Synth writers emit transitional only,
    // so the strict layout is pinned by rewriting REAL container bytes:
    // same entries, same XML structure, strict URIs throughout.
    val trans = OoxmlCorpus.docxBytes(5)
    val entries = OoxmlDecode.zipEntries(trans)
    val strictEntries = entries.toSeq.sortBy(_._1).map { case (name, b) =>
      name -> new String(b, "UTF-8")
        .replace("schemas.openxmlformats.org/wordprocessingml/2006/main",
          "purl.oclc.org/ooxml/wordprocessingml/main")
        .replace(
          "schemas.openxmlformats.org/officeDocument/2006/relationships",
          "purl.oclc.org/ooxml/officeDocument/relationships")
    }
    assert(strictEntries.exists(_._2.contains("purl.oclc.org")),
      "rewrite must have produced a genuinely strict container")
    val strict = OoxmlSynth.zip(strictEntries)
    assert(OoxmlDecode.docxBodyElements(strict) ==
      OoxmlDecode.docxBodyElements(trans),
      "strict-namespace decode must equal the transitional decode")
    assert(OoxmlDecode.decodeDocx(strict) == OoxmlDecode.decodeDocx(trans))
  }

  test("rich-run sharedStrings: per-run t concatenated, phonetic rPh " +
    "runs excluded (hand-authored sst, the POI getString rule)") {
    val sst =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
        |<si><r><rPr><b/><sz val="11"/></rPr><t>Bene</t></r><r><t xml:space="preserve">ficiary </t></r><r><t>A</t></r></si>
        |<si><t>plain</t></si>
        |<si><r><t>漢字</t></r><rPh sb="0" eb="2"><t>かんじ</t></rPh><phoneticPr fontId="1"/></si>
        |</sst>""".stripMargin
    val got = OoxmlDecode.parseSharedStrings(Some(sst.getBytes("UTF-8")))
    assert(got == Vector("Beneficiary A", "plain", "漢字"))
  }

  test("xlsx decode: sheets, shared strings, cell model, beneficiaries") {
    val bytes = OoxmlSynth.xlsx(Seq(
      "Выписка 01.03.2020" -> Seq(
        Seq("Наименование", "Наименование компании и ФИО владельца"),
        Seq("ООО Ромашка", "Иванов И.И."),
        Seq("АО Лютик", "Петров П.П.")),
      "Sheet2" -> Seq(Seq("x"))))
    val sheets = OoxmlDecode.decodeXlsx(bytes)
    assert(sheets.map(_.name) == Seq("Выписка 01.03.2020", "Sheet2"))
    assert(sheets.head.rows.size == 3)
    assert(sheets.head.rows.head.cells.head ==
      SheetTable.Cell(0, "STRING", "Наименование"))
    val bens = SheetTable.parseBeneficiaries(sheets)
    assert(bens.map(b => (b.name, b.namePerson)) ==
      Seq(("ООО Ромашка", "Иванов И.И."), ("АО Лютик", "Петров П.П.")))
    assert(SheetTable.parseDateFromSheetName(sheets.head.name)
      .contains(java.time.LocalDate.of(2020, 3, 1)))
  }

  test("formula cells are FORMULA (POI parity), never STRING — the " +
      "cached-string trap stays out of the beneficiary scan") {
    val sheets = OoxmlDecode.decodeXlsx(OoxmlCorpus.xlsxBytes(3))
    val rows = sheets.head.rows
    // row 2: <c t="str"><f/><v>ООО Фальшь 3</v></c> + numeric-cached
    // <c><f/><v>3.0</v></c> — POI surfaces BOTH as CellType.FORMULA
    // (XSSFCell: an <f> child, or t="str", means formula), so the
    // STRING-only scan (ExcelParser.java:160) skips the row entirely
    assert(rows(2).cells.map(c => (c.cellType, c.value)) ==
      Seq(("FORMULA", "ООО Фальшь 3"), ("FORMULA", "3.0")))
    // plain numeric row stays NUMERIC (no <f>)
    assert(rows(4).cells.map(_.cellType) == Seq("NUMERIC"))
    val bens = SheetTable.parseBeneficiaries(sheets)
    assert(bens.size == 2)
    assert(!bens.exists(b => Option(b.name).exists(_.contains("Фальшь"))))
  }

  test("column index decode: A, Z, AA, BC") {
    assert(OoxmlDecode.colIndex("A1") == 0)
    assert(OoxmlDecode.colIndex("Z9") == 25)
    assert(OoxmlDecode.colIndex("AA12") == 26)
    assert(OoxmlDecode.colIndex("BC3") == 54)
  }

  test("zip-bomb guard throws past the inflation cap") {
    // a highly-compressible entry (1 MB of zeros) against a 100 KB cap:
    // the guard must fire while INFLATING, not after buffering
    val bomb = OoxmlSynth.zip(Seq("word/document.xml" -> ("x" * 1000000)))
    intercept[IllegalArgumentException] {
      OoxmlDecode.zipEntries(bomb, cap = 100000L)
    }
    // and the default cap admits it fine
    assert(OoxmlDecode.zipEntries(bomb).contains("word/document.xml"))
  }
}
