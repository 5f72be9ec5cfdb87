package graft.sources

import graft.core.{MultiDoc, PdfTable, SheetTable}

/** Format dispatch over raw document bytes — the reference's S1 surface
  * (`parse(filePath)` keyed on the uppercase file extension,
  * `DocumentParser.java:92-95`), re-keyed on CONTENT MAGIC: at corpus
  * scale file names lie, bytes do not.
  *
  *   - `%PDF`            -> [[PdfDecode]]
  *   - CFB magic D0CF11E0 -> [[DocDecode]] when a WordDocument stream
  *     exists, [[XlsDecode]] when a Workbook/Book stream exists
  *   - zip magic PK      -> [[OoxmlDecode]] DOCX (word/document.xml)
  *     or XLSX (xl/workbook.xml)
  *   - anything else     -> plain text for the transcript tokenizer
  *     (the per-turn route the pipeline already runs)
  */
object BinaryDispatch {

  sealed trait Decoded
  final case class DecodedDoc(format: String, md: MultiDoc) extends Decoded
  final case class DecodedSheets(format: String,
                                 sheets: Seq[SheetTable.Sheet]) extends Decoded
  final case class DecodedPdf(format: String,
                              stakeholders: Seq[PdfTable.Stakeholder])
    extends Decoded
  final case class DecodedText(format: String, text: String) extends Decoded

  /** Content-magic format sniff: doc / xls / docx / xlsx / pdf / text. */
  def sniff(bytes: Array[Byte]): String = {
    if (bytes.length >= 4 && bytes(0) == '%' && bytes(1) == 'P' &&
        bytes(2) == 'D' && bytes(3) == 'F') return "pdf"
    if (bytes.length >= 4 && (bytes(0) & 0xFF) == 0xD0 &&
        (bytes(1) & 0xFF) == 0xCF && (bytes(2) & 0xFF) == 0x11 &&
        (bytes(3) & 0xFF) == 0xE0) {
      val streams = CfbDecode.streams(bytes).keySet
      return if (streams.contains("WordDocument")) "doc"
      else if (streams.contains("Workbook") || streams.contains("Book")) "xls"
      else "cfb"
    }
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == 'K') {
      val entries = OoxmlDecode.zipEntries(bytes).keySet
      return if (entries.contains("word/document.xml")) "docx"
      else if (entries.contains("xl/workbook.xml")) "xlsx"
      else "zip"
    }
    "text"
  }

  /** Decode any supported document (the reference's one-call entry). */
  def decode(bytes: Array[Byte]): Decoded = sniff(bytes) match {
    case "pdf" =>
      DecodedPdf("pdf", PdfTable.parseStakeholderPages(
        PdfDecode.pages(bytes), PdfDecode.pageWidth(bytes)))
    case "doc" => DecodedDoc("doc", DocDecode.decodeDoc(bytes))
    case "docx" => DecodedDoc("docx", OoxmlDecode.decodeDocx(bytes))
    case "xls" => DecodedSheets("xls", XlsDecode.decodeXls(bytes))
    case "xlsx" => DecodedSheets("xlsx", OoxmlDecode.decodeXlsx(bytes))
    case f => DecodedText(f, new String(bytes, "UTF-8"))
  }
}
