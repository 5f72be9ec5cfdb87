package graft.sources

import java.nio.file.{Files, Paths, Path}

/** Deterministic OOXML corpora for the decode oracle queries (q58/q60).
  * Content is a pure function of the document index (and the zip is
  * byte-stable, [[OoxmlSynth.zip]]), so the DuckDB oracle can state the
  * expected extraction in closed form over `range(n)` — no external
  * data, per the round's input contract. Written once under /tmp and
  * reused (the _SUCCESS marker makes generation idempotent across
  * concurrent query construction).
  */
object OoxmlCorpus {

  val nDocx = 40
  val nXlsx = 10

  /** The q58 corpus document for id i: a bold title (header via
    * all-runs-bold), a plain body, a centered section header (header
    * via alignment), numbered terms (ListRef prefixing "1. "/"2. "),
    * a TOC field paragraph (skipped by F2), and a 2-column
    * non-bilingual table (rows CanNot -> body). Expected segmentation
    * is pinned in OoxmlDecodeSpec AND in the q58 oracle SQL.
    */
  def docxBytes(i: Int): Array[Byte] = {
    import OoxmlSynth.{P, Tbl, TextBox, SdtBlock, InlineSdtP}
    // the TextBox is the embedded-object trap: its box text must NOT
    // reach the body (POI parity — and a non-skipping reader would
    // leak it TWICE via Choice+Fallback), while its host paragraph
    // stays ordinary body text. The SdtBlock is the content-control
    // trap: the reference drops BLOCK-level w:sdt unprocessed
    // (DocumentParser.java:407-409), while the InlineSdtP paragraph's
    // inline control text MUST be included (POI paragraph text) —
    // both directions gate the q58/q65 oracles.
    OoxmlSynth.docx(Seq(
      P(Seq(s"AGREEMENT DOCUMENT $i" -> Some(true))),
      P.plain(s"This agreement number $i is made between the parties."),
      P(Seq(s"SECTION $i OVERVIEW" -> None), center = true),
      P.plain(s"Terms and conditions follow for document $i."),
      P(Seq(s"first term of document $i" -> None), numId = 1),
      P(Seq(s"second term of document $i" -> None), numId = 1),
      P(Seq(s"Contents $i" -> None), toc = true),
      Tbl(Seq(Seq(s"alpha $i", s"beta $i"), Seq(s"gamma $i", s"delta $i"))),
      TextBox(s"signed at location $i", s"STAMP BOX $i NOT BODY TEXT"),
      SdtBlock(Seq(P.plain(s"CONTROLLED COVER $i DROPPED"))),
      InlineSdtP(s"approved ", s"clause $i", " final")))
  }

  /** The q60 workbook for id w: one dated sheet (X2 surface) holding a
    * title row (E1 column discovery) and two beneficiary rows (E2
    * projection). Years 2020+w keep the dates distinct per file.
    */
  def xlsxBytes(w: Int): Array[Byte] = {
    import OoxmlSynth.{XStr, XNum, XFormulaStr, XFormulaNum}
    // the formula row is a type-confusion trap: its cached string sits
    // under the discovered name column and WOULD parse as a beneficiary
    // if FORMULA cells (POI CellType for <f>/t="str") were misread as
    // STRING — the reference's STRING-only scan skips them
    // (ExcelParser.java:160), so the oracle stays at 2 rows per file
    OoxmlSynth.xlsxTyped(Seq(
      s"Выписка 15.03.${2020 + w}" -> Seq(
        Seq(XStr("Наименование"),
          XStr("Наименование компании и ФИО владельца")),
        Seq(XStr(s"ООО Фирма $w-1"), XStr(s"Иванов И.$w")),
        Seq(XFormulaStr("CONCATENATE(A2,B2)", s"ООО Фальшь $w"),
          XFormulaNum("SUM(1,2)", 3.0)),
        Seq(XStr(s"АО Завод $w-2"), XStr(s"Петров П.$w")),
        Seq(XNum(w * 1.5)))))
  }

  val nDoc62 = 20

  /** The q62 corpus document for id i: a real Word97 binary (.doc) —
    * bold all-caps title (header via the per-run bold/caps test of the
    * DOC predicate), plain body, jc=center header, body, indented
    * header (dxaLeft 6000 / xaPage 20000 = 0.30 > 0.25), body, then the
    * r05 real-bytes list tier: three numbered items (PlfLst/PlfLfo ->
    * sprmPIlfo, incl. the reference's root-seeding off-by-one — the
    * first level-0 item reads "2.", DocumentParser.java:145-166), a
    * level-1 item ("3.1."), a bullet item (nfc 23 -> "•"), and a
    * page-width discriminator (dxaLeft 4000: 0.20 under the REAL
    * sprmSXaPage=20000, but 0.327 -> header under the default 12240 —
    * a wrong SEP decode flips the segmentation and fails the oracle),
    * and the r05 REAL-table tier (0x07 cell/row marks +
    * sprmPFInTable/sprmPFTtp): two 2-cell rows (demoted to body by the
    * per-row CanNot gate — the second with a two-paragraph first cell
    * exercising 0x0D-inside-cell), a single-cell row whose bold caps
    * text PROMOTES to a header (row.size == 1 -> Can), then a final
    * 2-cell row landing in that header's body — flattening tables back
    * to paragraph marks would turn every cell into its own
    * header-candidate paragraph and fail the oracle.
    * Cyrillic list items route the whole corpus through UTF-16 pieces.
    * Expected segmentation (incl. the DocumentParser.java:179
    * unconditional leading space) pinned in DocDecodeSpec AND the q62
    * oracle SQL.
    */
  def docBytes62(i: Int): Array[Byte] = {
    import DocSynth.{DocP, Lst, Lvl}
    DocSynth.doc(Seq(
      DocP(s"AGREEMENT $i TITLE", bold = true),
      DocP(s"agreement body text number $i lorem"),
      DocP(s"Section $i details", jc = 1),
      DocP(s"closing details for document $i"),
      DocP(s"indented note $i", dxaLeft = 6000),
      DocP(s"final remark $i"),
      DocP(s"первый пункт $i", ilfo = 1),
      DocP(s"второй пункт $i", ilfo = 1),
      DocP(s"подпункт $i", ilfo = 1, ilvl = 1),
      DocP(s"маркер $i", ilfo = 2),
      DocP(s"wide indent note $i", dxaLeft = 4000)) ++
      DocSynth.tableParas(Seq(
        Seq(Seq(DocP(s"продавец $i")), Seq(DocP(s"покупатель $i"))),
        Seq(Seq(DocP(s"адрес $i"), DocP(s"город $i")),
          Seq(DocP(s"регион $i"))),
        Seq(Seq(DocP(s"APPENDIX $i TERMS", bold = true))),
        Seq(Seq(DocP(s"итог $i")), Seq(DocP(s"сумма $i"))))),
      unicode = true,
      lists = Seq(
        Lst(100, Seq(Lvl(1, 0, "\u0000."), Lvl(1, 0, "\u0000.\u0001."))),
        Lst(200, Seq(Lvl(1, 23, "")))),
      xaPage = 20000)
  }

  private def ensure(dir: String, n: Int, ext: String,
                     gen: Int => Array[Byte]): String = synchronized {
    val d = Paths.get(dir)
    if (!Files.exists(d.resolve("_SUCCESS"))) {
      Files.createDirectories(d)
      for (i <- 0 until n) {
        val p = d.resolve(f"doc_$i%05d.$ext")
        Files.write(p, gen(i))
      }
      Files.write(d.resolve("_SUCCESS"), Array.emptyByteArray)
    }
    dir
  }

  def ensureDocx(): String =
    ensure("/tmp/graft_docx_corpus_v3", nDocx, "docx", docxBytes)

  def ensureXlsx(): String =
    ensure("/tmp/graft_xlsx_corpus_v2", nXlsx, "xlsx", xlsxBytes)

  def ensureDoc62(): String =
    ensure("/tmp/graft_doc_corpus_v3", nDoc62, "doc", docBytes62)

  /** The q63 workbook for id w — the q60 content shape as a REAL BIFF8
    * .xls (Cyrillic titles exercise the UTF-16 SST path), so q63's
    * oracle is q60's closed form. The r05 numeric tail rows ride as
    * RK/MulRk records (the compressed numeric forms real-world writers
    * emit): they land in the sheet model as NUMERIC cells, which the
    * STRING-only beneficiary scan (F9) must skip — a type-confusion
    * regression would add rows and fail the oracle. Every third
    * workbook caps SST records at 48 bytes, spilling the shared strings
    * across Continue records with mid-string (UTF-16) splits — the
    * big-SST layout — and must decode identically.
    */
  def xlsBytes(w: Int): Array[Byte] = {
    import XlsSynth.{SCell, RkCell, FCell, LCell}
    // FCell = the same type-confusion trap as the XLSX corpus: a
    // Formula record whose cached String-record text matches the name
    // column — POI surfaces it as FORMULA, so E1/E2 must skip it.
    // The 'Иванов' cell rides as an inline-string Label record (the
    // pre-SST layout) — a decoder without 0x0204 drops the person
    // column of that row and fails the q63 oracle.
    XlsSynth.xlsTyped(Seq(
      s"Выписка 15.03.${2020 + w}" -> Seq(
        Seq(SCell("Наименование"),
          SCell("Наименование компании и ФИО владельца")),
        Seq(SCell(s"ООО Фирма $w-1"), LCell(s"Иванов И.$w")),
        Seq(FCell("CONCATENATE(A2)", s"ООО Фальшь $w")),
        Seq(SCell(s"АО Завод $w-2"), SCell(s"Петров П.$w")),
        Seq(RkCell(123.45), RkCell(-7.0), RkCell(0.07)), // one MulRk
        Seq(RkCell(2.5)))),                              // one RK
      sstCap = if (w % 3 == 0) 48 else 8224)
  }

  def ensureXls(): String =
    ensure("/tmp/graft_xls_corpus_v5", nXlsx, "xls", xlsBytes)

  val nPdf = 13

  /** The q64 stakeholder PDF for id w ([[PdfSynth.stakeholderPdf]]),
    * cycling the thirteen real-world convention variants — all must
    * decode to the same 9 stakeholders (one oracle over the union):
    * w%13==0 FlateDecode; 1 uncompressed; 2 Flate + `cm`-scaled content
    * (coords halved under a q 2 0 0 2 0 0 cm — only a CTM-folding
    * decoder recovers the geometry); 3 hex-string `<...>` operands;
    * 4 /FirstChar+/Widths font metrics (per-glyph advances); 5 PDF 1.5
    * object-stream file (/ObjStm + XRef stream) carrying the widths
    * font — only an ObjStm-expanding decoder sees its page tree at all;
    * 6 /Filter [ /ASCIIHexDecode /FlateDecode ] chain (hex-wrapped
    * deflate — only a chain-applying decoder reads its content);
    * 7 /Rotate 90 landscape (the scanned-filing layout — only a
    * rotation-normalizing decoder recovers upright geometry);
    * 8 Predictor-12 (PNG up) coded Flate content; 9 single-byte
    * /ToUnicode-CMap subset encoding; 10 composite /Type0 /Identity-H
    * font (two-byte CID codes, /DescendantFonts /W metrics — only a
    * CID-aware decoder reads any text at all); 11 Tc/Tz text-state
    * layout (letterspaced-condensed: constant-800 /Widths with
    * Tc=0.2*size and Tz 50 — the same displayed geometry, but a
    * decoder skipping the §9.4.4 spacing terms overshoots every
    * advance by 60% and mis-bins glyphs into neighboring cells);
    * 12 kerning-jump TJ rows (each table row ONE TJ array whose
    * number operands position the cells — a decoder ignoring TJ
    * adjustments collapses every cell onto column one).
    */
  def pdfBytes(w: Int): Array[Byte] = w % 13 match {
    case 0 => PdfSynth.stakeholderPdf(w, compress = true)
    case 1 => PdfSynth.stakeholderPdf(w)
    case 2 => PdfSynth.stakeholderPdf(w, compress = true, scale = 2f)
    case 3 => PdfSynth.stakeholderPdf(w, hexStrings = true)
    case 4 => PdfSynth.stakeholderPdf(w, compress = true, widths = true)
    case 5 => PdfSynth.stakeholderPdf(w, widths = true, objStm = true)
    case 6 => PdfSynth.stakeholderPdf(w, hexChain = true)
    case 7 => PdfSynth.stakeholderPdf(w, compress = true, rotate90 = true)
    case 8 => PdfSynth.stakeholderPdf(w, predictor = true)
    case 9 => PdfSynth.stakeholderPdf(w, cmapEncoded = true)
    case 10 => PdfSynth.stakeholderPdf(w, identityH = true)
    case 11 => PdfSynth.stakeholderPdf(w, textState = true)
    case _ => PdfSynth.stakeholderPdf(w, tjRows = true)
  }

  def ensurePdf(): String =
    ensure("/tmp/graft_pdf_corpus_v9", nPdf, "pdf", pdfBytes)

  // ---------- q69: deterministic corrupt corpora ----------
  //
  // Each recipe is STRUCTURALLY guaranteed to fail decode (pinned per
  // id by DecodeFuzzSpec, which is what licenses the closed-form q69
  // oracle): the failure comes from a structural hole every instance
  // shares, not from where a random flip happened to land.

  val nCorrupt = 10

  /** Truncated PDF: header survives, every indirect object is gone, so
    * the page walk finds no /Catalog. Fails for every id.
    */
  def corruptPdfBytes(i: Int): Array[Byte] =
    java.util.Arrays.copyOf(pdfBytes(i % nPdf), 40)

  /** CFB header only: the DIFAT's first FAT sector sits past the
    * truncation, so the sector-range guard fires. Fails for every id.
    */
  def corruptCfbBytes(i: Int): Array[Byte] =
    java.util.Arrays.copyOf(docBytes62(i % nDoc62), 512)

  /** Zip with everything after byte 64 zeroed: the first local entry's
    * deflate data (and the central directory) is destroyed, so entry
    * reads fail inside the container scan. Fails for every id.
    */
  def corruptZipBytes(i: Int): Array[Byte] = {
    val b = docxBytes(i % nDocx).clone()
    java.util.Arrays.fill(b, 64, b.length, 0.toByte)
    b
  }

  /** Deterministic non-document bytes (leading 'G' dodges every magic):
    * the dispatch's text fallback route — decodes ok as plain text.
    */
  def garbageBytes(i: Int): Array[Byte] =
    ('G'.toByte) +: Array.tabulate[Byte](200 + 13 * i)(j =>
      (32 + ((i * 31 + j * 7) % 90)).toByte)

  def ensureCorruptPdf(): String =
    ensure("/tmp/graft_badpdf_corpus_v6", nCorrupt, "pdf", corruptPdfBytes)
  def ensureCorruptCfb(): String =
    ensure("/tmp/graft_badcfb_corpus_v3", nCorrupt, "doc", corruptCfbBytes)
  def ensureCorruptZip(): String =
    ensure("/tmp/graft_badzip_corpus_v3", nCorrupt, "docx", corruptZipBytes)
  def ensureGarbage(): String =
    ensure("/tmp/graft_garbage_corpus_v1", nCorrupt, "txt", garbageBytes)
}
