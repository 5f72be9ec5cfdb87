package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** DOC (HWPF) header-predicate dialect (DocumentParser.java:809-859) and
  * the maxBodyLength guard (:64) — VERDICT r01 "missing" items 2 and 3.
  */
class DocDialectSpec extends AnyFunSuite {

  private def doc(el: Element): Element = el.copy(docDialect = true)

  test("gd01 indent route (:824-826) — both dialects") {
    val el = Element("lowercase body text", Seq(Run("lowercase body text")),
      indentRatio = 0.3f)
    assert(Segmenter.isHeader(doc(el)))
    assert(Segmenter.isHeader(el))
  }

  test("gd02 fontAlignment==3 / justification 1|2 route (:828-832)") {
    val base = Element("plain lowercase", Seq(Run("plain lowercase")))
    assert(Segmenter.isHeader(doc(base.copy(fontAlignment = 3))))
    assert(Segmenter.isHeader(doc(base.copy(justification = 1))))
    assert(Segmenter.isHeader(doc(base.copy(justification = 2))))
    // justification 3 (both-justified) is NOT a header route
    assert(!Segmenter.isHeader(doc(base.copy(justification = 3))))
    // the DOCX dialect ignores these DOC attributes entirely
    assert(!Segmenter.isHeader(base.copy(fontAlignment = 3)))
  }

  test("gd03 <5 alphanumerics gate (:834-837)") {
    val el = Element("AB 12", Seq(Run("AB 12")))
    assert(!Segmenter.isHeader(doc(el)))
  }

  test("gd04 per-run caps: each run needs its own >=5 caps run (:849-852)") {
    // whole-paragraph text "ABC DEFGH" has a 5-caps run => DOCX header;
    // but the DOC dialect checks runs individually: "ABC " fails
    val runs = Seq(Run("ABC "), Run("DEFGH"))
    val el = Element("ABC DEFGH", runs)
    assert(Segmenter.isHeader(el), "DOCX whole-paragraph caps accepts")
    assert(!Segmenter.isHeader(doc(el)), "DOC per-run caps rejects")
    // both runs individually capitalized with >=5-char sequences: header
    val ok = Element("ABCDE FGHIJ", Seq(Run("ABCDE "), Run("FGHIJ")))
    assert(Segmenter.isHeader(doc(ok)))
    // one lowercase run kills caps (and bold is unset) => not a header
    val mixed = Element("ABCDE fghij", Seq(Run("ABCDE "), Run("fghij")))
    assert(!Segmenter.isHeader(doc(mixed)))
  }

  test("gd05 DOC bold is direct per-run, no XOR chain (:853)") {
    // all runs bold => header even in lowercase
    val bold = Element("lowercase header", Seq(
      Run("lowercase ", bold = Some(true)), Run("header", bold = Some(true))))
    assert(Segmenter.isHeader(doc(bold)))
    // paragraph style-chain bold is a DOCX-only concept: the DOC dialect
    // must NOT inherit it into unset runs
    val styled = Element("lowercase header", Seq(Run("lowercase header")),
      styleBoldChain = Seq(true))
    assert(Segmenter.isHeader(styled), "DOCX inherits style bold")
    assert(!Segmenter.isHeader(doc(styled)), "DOC reads runs directly")
    // blank runs are skipped in both dialects
    val blankRun = Element("ABCDE", Seq(Run("  "), Run("ABCDE")))
    assert(Segmenter.isHeader(doc(blankRun)))
  }

  test("gd06 tokenizer markup ^D/^A3/^J1/^J2 reaches the element") {
    val el = Tokenizer.parseLine("^D ^J1 hello world")
    assert(el.docDialect && el.justification == 1)
    assert(el.text == "hello world")
    val el2 = Tokenizer.parseLine("^D ^A3 hello world")
    assert(el2.docDialect && el2.fontAlignment == 3)
    // end-to-end: the DOC justification route makes a header out of a
    // line the DOCX dialect would fold into the body
    val md = Segmenter.segment(Tokenizer.tokenize(
      "FIRST HEADER\nbody text line one\n^D ^J1 second header lowercase\nmore body"))
    val paras = md.documents.head.paragraphs
    // DOC :179 prepends `prefix + " "` unconditionally, so non-list DOC
    // paragraphs carry a leading space (DOCX paragraphs do not)
    assert(paras.map(_.header.text) == Seq("FIRST HEADER",
      " second header lowercase"))
    val mdDocx = Segmenter.segment(Tokenizer.tokenize(
      "FIRST HEADER\nbody text line one\nsecond header lowercase\nmore body"))
    assert(mdDocx.documents.head.paragraphs.size == 1)
  }

  test("gd10 DOC :179 unconditional prefix space; DOCX :504 conditional") {
    // empty list prefix: DOC paragraphs still get " " + text
    val md = Segmenter.segment(Tokenizer.tokenize(
      "^D FIRST HEADER\n^D body text here"))
    val p = md.documents.head.paragraphs.head
    assert(p.header.text == " FIRST HEADER")
    assert(p.body.text == " body text here")
    // list items: numberPrefix already carries the :642 trailing space,
    // so both dialects agree — exactly one space between prefix and text
    val listed = Segmenter.segment(Tokenizer.tokenize(
      "^D LIST HEADER\n^D #N(7,0) пункт один"))
    assert(listed.documents.head.paragraphs.head.body.text == "1. пункт один")
    // DOCX: empty prefix prepends nothing
    val docx = Segmenter.segment(Tokenizer.tokenize(
      "FIRST HEADER\nbody text here"))
    assert(docx.documents.head.paragraphs.head.body.text == "body text here")
  }

  test("gd09 DOC dialect offsets count the stripped paragraph mark") {
    // POI char offsets (DocumentParser.java:188,201) include the \r each
    // HWPF paragraph ends with; the DOCX running offset (:472) does not
    val md = Segmenter.segment(Tokenizer.tokenize(
      "^D FIRST HEADER\n^D body text here\n^D ^J1 header two"))
    val paras = md.documents.head.paragraphs
    assert(paras(0).header.offset == 0)
    assert(paras(0).body.offset == "FIRST HEADER".length + 1)
    assert(paras(1).header.offset ==
      "FIRST HEADER".length + 1 + "body text here".length + 1)
    // DOCX elements in the same stream advance without the +1
    val mixed = Segmenter.segment(Tokenizer.tokenize(
      "FIRST HEADER\nsome body line\n^D ^J1 second"))
    assert(mixed.documents.head.paragraphs(1).header.offset ==
      "FIRST HEADER".length + "some body line".length)
  }

  test("gd07 maxBodyLength guard bounds body accumulation") {
    val chunk = "x" * 30000
    val elems = ParaElement(Element("HEADER", Seq(Run("HEADER")))) +:
      Seq.fill(6)(ParaElement(Element(chunk, Seq(Run(chunk)))))
    val md = Segmenter.segment(elems)
    val body = md.documents.head.paragraphs.head.body
    // growth stops at the first append past the bound
    assert(body.length >= Segmenter.maxBodyLength)
    assert(body.length < Segmenter.maxBodyLength + chunk.length + 1)
    val overflow = md.spans.filter(_.kind == "body_overflow")
    assert(overflow.size == 2, s"got ${overflow.size} overflow spans")
    assert(overflow.forall(_.length == chunk.length))
  }

  test("gd08 dead-path scalars X5/X7/X8 (documented reference dialects)") {
    // X5 — document number (DocumentParser.java:31-32)
    assert(DocScalars.findDocumentNumber("Договор № 12-АБ/3 от такого-то")
      .contains("12-АБ/3"))
    assert(DocScalars.findDocumentNumber("№ ---").isEmpty) // validation gate
    assert(DocScalars.findDocumentNumber("no number here").isEmpty)
    // X7 — name/shortName split (ExcelParser.java:32)
    assert(DocScalars.splitNameShort(
      "Общество Ромашка (сокращенное - ООО Ромашка)")
      .contains(("Общество Ромашка", "ООО Ромашка")))
    assert(DocScalars.splitNameShort("Общество Ромашка").isEmpty)
    // X8 — person mentions, initials before or after (ExcelParser.java:34)
    // (the reference's \s* inside the initials group greedily includes a
    // trailing space — kept faithful, compared trimmed here)
    assert(DocScalars.findPersons("решение принял И. И. Иванов единолично")
      .map(_.trim) == Seq("И. И. Иванов"))
    assert(DocScalars.findPersons("Петров-Водкин К. С. и А. Б. Сидоров")
      .map(_.trim) == Seq("Петров-Водкин К. С.", "А. Б. Сидоров"))
    assert(DocScalars.findPersons("нет персон").isEmpty)
  }
}
