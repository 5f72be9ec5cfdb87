package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden cases per FIXTURES.md §4, each pinned to the reference lines it
  * exercises. Expectations are hand-derived from the reference semantics.
  */
class SegmenterSpec extends AnyFunSuite {

  private def seg(text: String): MultiDoc =
    Segmenter.segment(Tokenizer.tokenize(text))

  private def paras(md: MultiDoc): Seq[Para] = md.documents.flatMap(_.paragraphs)

  // g01 — first paragraph of first doc is always a header (:181-182,:501-502)
  test("g01 first para of first doc is header even when plain") {
    val md = seg("hello world")
    assert(md.documents.size == 1)
    val p = paras(md)
    assert(p == Seq(Para(TextSeg(0, "hello world", 11), TextSeg.empty)))
  }

  // g02 — consecutive headers concatenate with separator-join (:503-504)
  test("g02 consecutive headers merge") {
    val md = seg("^C TITLE ONE\n^C TITLE TWO\nbody text here")
    val p = paras(md)
    assert(p.size == 1)
    assert(p.head.header == TextSeg(0, "TITLE ONE\nTITLE TWO", 19))
    assert(p.head.body == TextSeg(18, "body text here", 14))
  }

  // g03 — separator-join: no doubling when chunk already ends with \n
  test("g03 SegBuilder separator-join rule (TextSegment.java:27-34)") {
    val a = new SegBuilder(0, "a\n")
    a.addText("b")
    assert(a.text == "a\nb" && a.length == 3)
    val b = new SegBuilder(0, "a")
    b.addText("b")
    assert(b.text == "a\nb")
    val c = new SegBuilder(0, "a")
    c.addText("") // quirk: appends a lone separator
    assert(c.text == "a\n" && c.length == 2)
    val d = new SegBuilder(0, "")
    d.addText("x") // empty buffer: no separator
    assert(d.text == "x")
  }

  // g04 — header truth table (:828-858,:904-946)
  test("g04 header predicate: align x bold x caps x alnum gate") {
    def el(t: String, runs: Seq[Run], align: Align = Align.Left) =
      Element(t, runs, align)
    // caps with >=5 letters
    assert(Segmenter.isHeader(el("HELLO WORLD", Seq(Run("HELLO WORLD")))))
    // plain mixed case
    assert(!Segmenter.isHeader(el("Hello World", Seq(Run("Hello World")))))
    // all runs bold
    assert(Segmenter.isHeader(
      el("Hello World", Seq(Run("Hello World", bold = Some(true))))))
    // mixed bold
    assert(!Segmenter.isHeader(el("Hello World",
      Seq(Run("Hello ", bold = None), Run("World", bold = Some(true))))))
    // <5 alnum fails the gate even in caps
    assert(!Segmenter.isHeader(el("HI", Seq(Run("HI")))))
    // alignment bypasses the alnum gate (checked before it)
    assert(Segmenter.isHeader(el("hi", Seq(Run("hi")), Align.Center)))
    assert(Segmenter.isHeader(el("hi", Seq(Run("hi")), Align.Right)))
    // digit-only runs cannot falsify all-bold (valuableSymbolPattern :940-941)
    assert(Segmenter.isHeader(el("12345", Seq(Run("12345")))))
    // blank runs are skipped (:939)
    assert(Segmenter.isHeader(el("HELLO x", // not caps (x)
      Seq(Run("HELLO", bold = Some(true)), Run("   "), Run("x", bold = Some(true))))))
  }

  // g05 — indentation threshold strictly > 0.25 (:67,:899-901)
  test("g05 indent header threshold") {
    assert(Segmenter.isHeader(Element("lower text", Seq(Run("lower text")),
      indentRatio = 0.26f)))
    assert(!Segmenter.isHeader(Element("lower text", Seq(Run("lower text")),
      indentRatio = 0.24f)))
    val md = seg(">>>> indented line\nplain body")
    // first-para rule makes it a header anyway; check tokenizer wiring via
    // a second indented line merging into the header
    val md2 = seg("plain first\n>>>> indented line")
    assert(paras(md2).head.header.text == "plain first\nindented line")
    assert(paras(md).head.header.text == "indented line")
  }

  // g06 — XOR bold inheritance (:914-925,:968-994)
  test("g06 style-chain XOR bold") {
    def el(chain: Seq[Boolean], runBold: Option[Boolean], styleBold: Boolean = false) =
      Element("Hello World", Seq(Run("Hello World", runBold, styleBold)),
        styleBoldChain = chain)
    assert(Segmenter.isHeader(el(Seq(true), None)))          // false^true = bold
    assert(!Segmenter.isHeader(el(Seq(true, true), None)))   // XOR cancels
    assert(!Segmenter.isHeader(el(Seq(true), Some(false))))  // explicit wins
    assert(!Segmenter.isHeader(el(Seq(true), None, styleBold = true))) // true^true
    assert(Segmenter.isHeader(el(Nil, None, styleBold = true))) // true^false
  }

  // g07 — multi-column non-bilingual table cell cannot be a header (:443-458)
  test("g07 table cell CAN_NOT in 2-col non-bilingual table") {
    val md = seg("^C TITLE\nsome body\n|**CELL A TEXT**|**CELL B TEXT**|")
    val p = paras(md)
    assert(p.size == 1)
    assert(p.head.header.text == "TITLE")
    assert(p.head.body == TextSeg(5, "some body\nCELL A TEXT\nCELL B TEXT", 33))
  }

  // g08 — bilingual 2-col constant table: cells CAN be headers (:427-442,:734-743)
  test("g08 bilingual table cells can be headers") {
    val md = seg("^C TITLE\nsome body\n|**ПРИВЕТ МИР**|**HELLO WORLD**|")
    val p = paras(md)
    assert(p.size == 2)
    assert(p(0).body.text == "some body")
    assert(p(1).header == TextSeg(14, "ПРИВЕТ МИР\nHELLO WORLD", 22))
  }

  // g08b — the CAN gate re-derivation inside a multi-col row (:456-457):
  // isPrevHeader || empty-doc-at-entry reopens the header gate even in a
  // non-bilingual 2-col table
  test("g08b table at document start: cells chain into one header") {
    val md = seg("|**AAAAA**|**BBBBB**|\nплоское тело")
    val p = paras(md)
    assert(p.size == 1)
    assert(p.head.header.text == "AAAAA\nBBBBB")
    assert(p.head.body.text == "плоское тело")
  }

  // g09 — TOC fields skipped, isPrevHeader reset (:496-499)
  test("g09 toc skipped and resets header state") {
    val md = seg("^C TITLE\n[TOC] toc line\n^C SECOND")
    val p = paras(md)
    assert(p.size == 2) // without the reset SECOND would merge into TITLE
    assert(p(0).header.text == "TITLE")
    assert(p(1).header.text == "SECOND")
    assert(md.spans.exists(s => s.kind == "toc" && s.offset == 5))
  }

  // g10 — sub-document split (:52-53,:680-693)
  test("g10 annex header starts a new document") {
    val md = seg(
      "^C Договор о поставке\nЭто тело договора.\n^C ПРИЛОЖЕНИЕ 1\nТекст приложения.")
    assert(md.documents.size == 2)
    assert(md.documents(0).docType == DocType.CONTRACT)
    assert(md.documents(1).docType == DocType.ANNEX)
    assert(md.documents(1).paragraphs.head.header.text == "ПРИЛОЖЕНИЕ 1")
    assert(md.documents(1).paragraphs.head.body.text == "Текст приложения.")
  }

  // g11 — un-split backtrack (:516-519)
  test("g11 split followed by body-first content rejoins previous doc") {
    val md = seg("^C Договор\nтело\n^C Приложение [TOC]\nпросто текст абзаца")
    assert(md.documents.size == 1)
    val p = paras(md)
    assert(p.size == 1)
    assert(p.head.body.text == "тело\nпросто текст абзаца")
  }

  // g12 — no split while all bodies empty (:695-702)
  test("g12 no sub-doc split before any body text") {
    val md = seg("^C Договор\n^C Приложение 1\nтело")
    assert(md.documents.size == 1)
    assert(paras(md).head.header.text == "Договор\nПриложение 1")
  }

  // g13 — nested decimal lists, increment resets sublevels, startAt override
  test("g13 nested list numbering") {
    val md = seg(Seq(
      "^C СПИСОК",
      "#N(1,0) Первый",
      "#N(1,0) Второй",
      "#N(1,1) Подпункт",
      "#N(1,1) Подпункт два",
      "#N(1,0) Третий",
      "#N(1,1) Снова").mkString("\n"))
    val body = paras(md).head.body.text
    assert(body == Seq(
      "1. Первый", "2. Второй", "2.1. Подпункт", "2.2. Подпункт два",
      "3. Третий", "3.1. Снова").mkString("\n"))
  }

  test("g13b startAt override vs increment (:560-566)") {
    val md = seg("^C СПИСОК\n#N(2,0,5) Пятый\n#N(2,0) Шестой")
    assert(paras(md).head.body.text == "5. Пятый\n6. Шестой")
  }

  // g14 — bullet format => bullet prefix (:567-569)
  test("g14 bullet list") {
    val md = seg("^C СПИСОК\n#B Пункт раз\n#B Пункт два")
    assert(paras(md).head.body.text == "• Пункт раз\n• Пункт два")
  }

  // g15 — unseen outer level backfilled as 1, not reset (:577-580)
  test("g15 zero backfill of outer level") {
    val md = seg("^C СПИСОК\n#N(3,1) Сирота")
    assert(paras(md).head.body.text == "1.1. Сирота")
  }

  // g16 — long header re-split at first newline (:63,:253-263)
  test("g16 long header split") {
    val h1 = "А" * 600
    val h2 = "Б" * 600
    val md = seg(s"^C $h1\n^C $h2\nтело")
    val p = paras(md).head
    assert(p.header == TextSeg(0, h1, 600))
    assert(p.body.offset == 600)
    assert(p.body.text == "\n" + h2 + "тело") // direct concat, not addText
  }

  // g17 — blank-header paragraph folded into previous body (:265-273)
  test("g17 empty header merge") {
    val md = seg("^C TITLE\nbody\n^P \nnext body")
    val p = paras(md)
    assert(p.size == 1)
    assert(p.head.body.text == "body\nnext body")
  }

  // g18/g22 — empty documents dropped; empty turn => empty output (:246-249)
  test("g18 empty turn yields zero documents") {
    assert(seg("").documents.isEmpty)
    assert(seg("   \n  \n").documents.isEmpty)
    assert(Segmenter.extractedText(seg("")) == "")
  }

  // g19 — PROTOCOL demotion of "решение принято" headers (:62,:278-296)
  test("g19 protocol demote") {
    val md = seg(Seq(
      "^C ПРОТОКОЛ заседания",
      "Повестка дня.",
      "^C РЕШЕНИЕ ПРИНЯТО единогласно",
      "Детали решения.").mkString("\n"))
    assert(md.documents.head.docType == DocType.PROTOCOL)
    val p = paras(md)
    assert(p.size == 1)
    assert(p.head.body.text ==
      "Повестка дня.\nРЕШЕНИЕ ПРИНЯТО единогласно\nДетали решения.")
  }

  // g20 — doc-type priority (:368-402)
  test("g20 earliest offset wins") {
    val md = seg("**ПРОТОКОЛ И ДОГОВОР**\nтело")
    assert(md.documents.head.docType == DocType.PROTOCOL)
  }
  test("g20b CHARTER overrides earlier match") {
    val md = seg("^C Договор и устав.\nтело")
    assert(md.documents.head.docType == DocType.CHARTER)
  }
  test("g20c 5-header cap") {
    val lines = (1 to 5).flatMap(i => Seq(s"^C ЗАГОЛОВОК НОМЕР $i", s"тело $i")) ++
      Seq("^C Договор №5", "тело 6")
    val md = seg(lines.mkString("\n"))
    assert(paras(md).size == 6)
    assert(md.documents.head.docType == DocType.UNKNOWN)
  }
  test("g20d body fallback when headers have no keyword") {
    val md = seg("^C ПРОЧЕЕ ЗАГЛАВИЕ\nЭто договор на поставку.")
    assert(md.documents.head.docType == DocType.CONTRACT)
  }

  // g21 — offset quirks: prefix not counted; table cells advance offset (:472,:508)
  test("g21 list prefix not counted in globalOffset") {
    val md = seg("^C СПИСОК\n#N(1,0) Пункт один\nобычный текст")
    val p = paras(md).head
    assert(p.body.offset == 6) // "СПИСОК".length
    assert(p.body.text == "1. Пункт один\nобычный текст")
    // next segment offset proves the prefix didn't advance the offset:
    // 6 + len("Пункт один")=10 => 16 for the third element
    val md2 = seg("^C СПИСОК\n#N(1,0) Пункт один\n^C ДАЛЕЕ ИДЕТ")
    assert(paras(md2)(1).header.offset == 16)
  }
  test("g21b table-cell paragraphs advance globalOffset") {
    val md = seg("^C TITLE\nbody\n|cell one text|cell two text|\nafter table\n^C NEXT HDR")
    val p = paras(md)
    assert(p.size == 2)
    // 5 + 4 + 13 + 13 + 11 = 46
    assert(p(1).header.offset == 46)
    assert(p(0).body.text == "body\ncell one text\ncell two text\nafter table")
  }

  // g24 — version stamp (:69,:101-102)
  test("g24 version stamped") {
    assert(seg("hello world").version == graft.BuildInfo.version)
  }

  // spans — header/body spans mirror segment offsets
  test("spans cover header and body segments") {
    val md = seg("^C TITLE\nbody text")
    assert(md.spans.contains(Span("header", 0, 5)))
    assert(md.spans.contains(Span("body", 5, 9)))
  }

  // extractedText — non-empty segments joined with \n
  test("extractedText concatenation") {
    val md = seg("^C TITLE\nbody text")
    assert(Segmenter.extractedText(md) == "TITLE\nbody text")
  }
}
