package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Deterministic OOXML synthesizer — builds byte-stable DOCX/XLSX
  * containers for the decode oracle surface (q58/q60) and the
  * OoxmlDecodeSpec fixtures. No media/POI dependency: the parts are
  * plain XML strings zipped with pinned entry order and timestamps, so
  * the same spec yields the same bytes on every run, host and JVM (the
  * oracle requirement).
  *
  * The synthesized documents exercise the decode surfaces the segmenter
  * consumes: explicit run bold, style-chain bold (basedOn resolution),
  * center/right alignment, indentation, numbering (numId -> abstractNum
  * lvlText/start), page breaks, TOC instrText fields, and tables.
  */
object OoxmlSynth {

  sealed trait Body

  /** Paragraph spec (one `w:p`). `runs` are (text, bold: Option) —
    * None leaves `w:b` unset (style fallback path).
    */
  final case class P(runs: Seq[(String, Option[Boolean])],
                     center: Boolean = false,
                     right: Boolean = false,
                     style: String = null,
                     numId: Int = -1,
                     ilvl: Int = 0,
                     toc: Boolean = false,
                     indentLeft: Long = 0L,
                     pageBreakBefore: Boolean = false) extends Body
  object P {
    def plain(text: String): P = P(Seq(text -> None))
    def bold(text: String): P = P(Seq(text -> Some(true)))
  }
  /** Table spec: rows -> cells, each cell one plain paragraph. */
  final case class Tbl(rows: Seq[Seq[String]], style: String = null)
    extends Body
  /** Nested-capable table spec: rows -> cells -> body streams (a cell
    * may hold paragraphs AND nested Tbl/TblRich in document order —
    * the `w:tbl`-inside-`w:tc` layout real contracts use).
    */
  final case class TblRich(rows: Seq[Seq[Seq[Body]]], style: String = null)
    extends Body

  /** A paragraph whose run carries a floating text box — the
    * signature-stamp layout: ONE `mc:AlternateContent` whose Choice
    * (DrawingML `w:drawing`/wps) and Fallback (VML `w:pict`) BOTH
    * embed the same `w:txbxContent` paragraph, exactly as Word writes
    * it. POI's paragraph text excludes box content entirely, so a
    * reader that didn't skip embedded subtrees would not only leak
    * `boxText` into the body — it would leak it TWICE.
    */
  final case class TextBox(hostText: String, boxText: String) extends Body

  /** A BLOCK-level content control (`w:sdt` wrapping whole paragraphs
    * in `w:sdtContent` — cover pages, SDT-wrapped TOCs): XWPF surfaces
    * it as ONE CONTENTCONTROL body element and the reference drops it
    * unprocessed (DocumentParser.java:407-409), so none of `ps` may
    * reach the body.
    */
  final case class SdtBlock(ps: Seq[P]) extends Body

  /** A paragraph with an INLINE content control between two plain
    * runs (`w:sdt` inside `w:p` — form fields, repeating-section
    * items): POI's paragraph text INCLUDES inline-SDT run content, so
    * the decoded paragraph must read `before + inner + after`.
    */
  final case class InlineSdtP(before: String, inner: String,
                              after: String) extends Body

  def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  private def paraXml(p: P): String = {
    val sb = new StringBuilder("<w:p>")
    val pPr = new StringBuilder
    if (p.pageBreakBefore) pPr ++= "<w:pageBreakBefore/>"
    if (p.style != null) pPr ++= s"""<w:pStyle w:val="${p.style}"/>"""
    if (p.numId >= 0)
      pPr ++= s"""<w:numPr><w:ilvl w:val="${p.ilvl}"/>""" +
        s"""<w:numId w:val="${p.numId}"/></w:numPr>"""
    if (p.indentLeft > 0) pPr ++= s"""<w:ind w:left="${p.indentLeft}"/>"""
    if (p.center) pPr ++= """<w:jc w:val="center"/>"""
    if (p.right) pPr ++= """<w:jc w:val="right"/>"""
    if (pPr.nonEmpty) sb ++= s"<w:pPr>$pPr</w:pPr>"
    if (p.toc)
      sb ++= "<w:r><w:instrText>PAGEREF _Toc1234</w:instrText></w:r>"
    for ((t, b) <- p.runs) {
      val rPr = b match {
        case Some(true) => "<w:rPr><w:b/></w:rPr>"
        case Some(false) => "<w:rPr><w:b w:val=\"0\"/></w:rPr>"
        case None => ""
      }
      sb ++= s"""<w:r>$rPr<w:t xml:space="preserve">${esc(t)}</w:t></w:r>"""
    }
    sb ++= "</w:p>"
    sb.toString
  }

  private def bodyXml(b: Body): String = b match {
    case p: P => paraXml(p)
    case t: Tbl =>
      tblRichXml(TblRich(
        t.rows.map(_.map(c => Seq(P.plain(c): Body))), t.style))
    case t: TblRich => tblRichXml(t)
    case s: SdtBlock =>
      "<w:sdt><w:sdtPr><w:alias w:val=\"block\"/></w:sdtPr>" +
        "<w:sdtContent>" + s.ps.map(paraXml).mkString +
        "</w:sdtContent></w:sdt>"
    case p: InlineSdtP =>
      def run(t: String) =
        s"""<w:r><w:t xml:space="preserve">${esc(t)}</w:t></w:r>"""
      "<w:p>" + run(p.before) +
        "<w:sdt><w:sdtPr><w:alias w:val=\"inline\"/></w:sdtPr>" +
        "<w:sdtContent>" + run(p.inner) + "</w:sdtContent></w:sdt>" +
        run(p.after) + "</w:p>"
    case tb: TextBox =>
      val inner = paraXml(P.plain(tb.boxText))
      s"""<w:p><w:r><w:t xml:space="preserve">${esc(tb.hostText)}""" +
        "</w:t></w:r><w:r>" +
        """<mc:AlternateContent""" +
        """ xmlns:mc="http://schemas.openxmlformats.org/markup-compatibility/2006"""" +
        """ xmlns:wps="http://schemas.microsoft.com/office/word/2010/wordprocessingShape">""" +
        """<mc:Choice Requires="wps"><w:drawing><wps:txbx>""" +
        s"""<w:txbxContent>$inner</w:txbxContent>""" +
        "</wps:txbx></w:drawing></mc:Choice>" +
        """<mc:Fallback><w:pict xmlns:v="urn:schemas-microsoft-com:vml">""" +
        "<v:shape><v:textbox>" +
        s"""<w:txbxContent>$inner</w:txbxContent>""" +
        "</v:textbox></v:shape></w:pict></mc:Fallback>" +
        "</mc:AlternateContent></w:r></w:p>"
  }

  private def tblRichXml(t: TblRich): String = {
    val sb = new StringBuilder("<w:tbl>")
    if (t.style != null)
      sb ++= s"""<w:tblPr><w:tblStyle w:val="${t.style}"/></w:tblPr>"""
    for (row <- t.rows) {
      sb ++= "<w:tr>"
      for (cell <- row)
        sb ++= s"<w:tc>${cell.map(bodyXml).mkString}</w:tc>"
      sb ++= "</w:tr>"
    }
    sb ++= "</w:tbl>"
    sb.toString
  }

  private val contentTypesDocx =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
    """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
    """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
    """<Default Extension="xml" ContentType="application/xml"/>""" +
    """<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>""" +
    """</Types>"""

  private val relsRoot =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
    """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
    """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>""" +
    """</Relationships>"""

  /** styles.xml: `Head1` bold; `Derived1` basedOn Head1 with rPr but b
    * unset (exercises the basedOn recursion); `NoRpr` has no rPr at all
    * (the reference's no-recursion quirk).
    */
  private val stylesXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
    """<w:styles xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
    """<w:style w:type="paragraph" w:styleId="Head1"><w:rPr><w:b/></w:rPr></w:style>""" +
    """<w:style w:type="paragraph" w:styleId="Derived1"><w:basedOn w:val="Head1"/><w:rPr><w:i/></w:rPr></w:style>""" +
    """<w:style w:type="paragraph" w:styleId="NoRpr"><w:basedOn w:val="Head1"/></w:style>""" +
    """<w:style w:type="paragraph" w:styleId="Plain1"><w:rPr><w:b w:val="0"/></w:rPr></w:style>""" +
    """</w:styles>"""

  /** numbering.xml: abstractNum 0 (decimal "%1." start 1, level 1
    * "%1.%2." start 1), num 1 -> abstract 0.
    */
  private val numberingXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
    """<w:numbering xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
    """<w:abstractNum w:abstractNumId="0">""" +
    """<w:lvl w:ilvl="0"><w:start w:val="1"/><w:numFmt w:val="decimal"/><w:lvlText w:val="%1."/></w:lvl>""" +
    """<w:lvl w:ilvl="1"><w:start w:val="1"/><w:numFmt w:val="decimal"/><w:lvlText w:val="%1.%2."/></w:lvl>""" +
    """</w:abstractNum>""" +
    """<w:num w:numId="1"><w:abstractNumId w:val="0"/></w:num>""" +
    """</w:numbering>"""

  /** Assemble a DOCX from body specs ([[P]] / [[Tbl]]). */
  def docx(bodies: Seq[Body], pageWidthTwips: Long = 12240L): Array[Byte] = {
    val bodyXml = bodies.map(this.bodyXml).mkString
    val documentXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
      s"""<w:body>$bodyXml""" +
      s"""<w:sectPr><w:pgSz w:w="$pageWidthTwips" w:h="15840"/></w:sectPr>""" +
      """</w:body></w:document>"""
    zip(Seq(
      "[Content_Types].xml" -> contentTypesDocx,
      "_rels/.rels" -> relsRoot,
      "word/document.xml" -> documentXml,
      "word/styles.xml" -> stylesXml,
      "word/numbering.xml" -> numberingXml))
  }

  // ---------- XLSX ----------

  private def cellRef(col: Int, row: Int): String = {
    var c = col
    val sb = new StringBuilder
    while (c >= 0) { sb.insert(0, ('A' + c % 26).toChar); c = c / 26 - 1 }
    sb.toString + (row + 1)
  }

  /** Typed XLSX synth cell: a shared-string STRING, a plain NUMERIC,
    * or a formula with its cached result — written as `<c t="str">`
    * (string-cached) / `<c>` (numeric-cached) with an `<f>` child, the
    * exact markup Excel emits and POI surfaces as CellType.FORMULA.
    */
  sealed trait XlsxCell
  final case class XStr(v: String) extends XlsxCell
  final case class XNum(v: Double) extends XlsxCell
  final case class XFormulaStr(f: String, cached: String) extends XlsxCell
  final case class XFormulaNum(f: String, cached: Double) extends XlsxCell

  /** Assemble an XLSX whose sheets hold STRING cells (inline via the
    * shared-string table, as Excel writes them). `sheets` = name ->
    * rows -> cells.
    */
  def xlsx(sheets: Seq[(String, Seq[Seq[String]])]): Array[Byte] =
    xlsxTyped(sheets.map { case (n, rows) => n -> rows.map(_.map(XStr)) })

  /** Typed form of [[xlsx]] (STRING + NUMERIC + FORMULA cells). */
  def xlsxTyped(sheets: Seq[(String, Seq[Seq[XlsxCell]])]): Array[Byte] = {
    val allStrings = sheets.flatMap(_._2.flatten)
      .collect { case XStr(s) => s }.distinct
    val sstIndex = allStrings.zipWithIndex.toMap
    val sharedXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      allStrings.map(s => s"<si><t xml:space=\"preserve\">${esc(s)}</t></si>")
        .mkString + "</sst>"
    val wbXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
      sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString + "</sheets></workbook>"
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      sheets.indices.map { i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
      }.mkString +
      s"""<Relationship Id="rId${sheets.size + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>""" +
      "</Relationships>"
    val sheetParts = sheets.zipWithIndex.map { case ((_, rows), i) =>
      val rowsXml = rows.zipWithIndex.map { case (cells, ri) =>
        s"""<row r="${ri + 1}">""" + cells.zipWithIndex.map { case (v, ci) =>
          val ref = cellRef(ci, ri)
          v match {
            case XStr(s) =>
              s"""<c r="$ref" t="s"><v>${sstIndex(s)}</v></c>"""
            case XNum(n) =>
              s"""<c r="$ref"><v>$n</v></c>"""
            case XFormulaStr(f, cached) =>
              s"""<c r="$ref" t="str"><f>${esc(f)}</f>""" +
                s"""<v>${esc(cached)}</v></c>"""
            case XFormulaNum(f, cached) =>
              s"""<c r="$ref"><f>${esc(f)}</f><v>$cached</v></c>"""
          }
        }.mkString + "</row>"
      }.mkString
      s"xl/worksheets/sheet${i + 1}.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
         """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
         s"<sheetData>$rowsXml</sheetData></worksheet>")
    }
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """</Types>"""
    val relsXlsx =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      """</Relationships>"""
    zip(Seq(
      "[Content_Types].xml" -> contentTypes,
      "_rels/.rels" -> relsXlsx,
      "xl/workbook.xml" -> wbXml,
      "xl/_rels/workbook.xml.rels" -> wbRels,
      "xl/sharedStrings.xml" -> sharedXml) ++ sheetParts)
  }

  /** Byte-stable zip: fixed entry order, pinned timestamps (1980-01-01,
    * the DOS-time epoch), default deflate — identical bytes per spec.
    */
  def zip(entries: Seq[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    for ((name, content) <- entries) {
      val e = new ZipEntry(name)
      e.setTime(315532800000L)
      zos.putNextEntry(e)
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }
}
