package graft.sources

import java.io.ByteArrayOutputStream

/** Deterministic PDF synthesizer: real PDF files (header, indirect
  * objects, page tree, content streams — optionally FlateDecode
  * compressed — cross-reference table and trailer with byte-exact
  * offsets) for the q64 decode oracle and PdfDecodeSpec. Byte-stable:
  * no timestamps, no IDs, fixed object order. Text and fill-path
  * conventions match [[PdfDecode]]'s interpreter (0.5 * fontSize glyph
  * advance, UTF-8 string bytes), so synthesized geometry decodes
  * exactly.
  */
object PdfSynth {

  /** One page's content ops. `scale != 1` divides every coordinate and
    * font size by the factor and wraps the stream in
    * `q scale 0 0 scale 0 0 cm ... Q` — the DEVICE geometry is
    * identical, but only a decoder that folds the CTM recovers it
    * (the r05 real-world convention gate). `hexStrings` emits text
    * operands as hex `<...>` strings instead of literal `(...)`.
    */
  /** Shared single-byte code table for the ToUnicode-CMap variant: the
    * embedded-subset convention — ASCII 32..126 keeps its identity
    * code, every other char gets the next code from 128 up, in first-use
    * order (deterministic given deterministic content). The table is
    * shared across a document's pages, matching the one shared /F1.
    */
  final class CmapCodes(val wide: Boolean = false) {
    private val assigned =
      scala.collection.mutable.LinkedHashMap[Char, Int]()
    def code(ch: Char): Int =
      if (!wide && ch >= 32 && ch < 127) ch.toInt
      else {
        // wide (Identity-H subset) fonts remap EVERYTHING — CIDs are
        // glyph indexes assigned in first-use order from 1, the way a
        // subsetting generator numbers the glyphs it keeps; ASCII gets
        // no identity escape, so a UTF-8/Latin-1 decode is pure noise
        require(assigned.size < (if (wide) 0xFFFF else 128),
          "code space exhausted")
        assigned.getOrElseUpdate(ch,
          (if (wide) 1 else 128) + assigned.size)
      }
    def hex(ch: Char): String =
      if (wide) f"${code(ch)}%04X" else f"${code(ch)}%02X"
    /** (code, char) pairs for the assigned codes, assignment order. */
    def entries: Seq[(Int, Char)] = assigned.toSeq.map(_.swap)
  }

  final class Content(scale: Float = 1f, hexStrings: Boolean = false,
                      cmap: CmapCodes = null,
                      textState: Boolean = false,
                      val tjRows: Boolean = false) {
    private val sb = new StringBuilder
    private def fmt(v: Float): String = f"${v / scale}%.1f"
    private def lit(s: String): String =
      "(" + s.replace("\\", "\\\\").replace("(", "\\(")
        .replace(")", "\\)") + ")"

    /** One whole table row as a SINGLE `TJ` array: the chunks are
      * positioned by KERNING jumps (negative adjustments move right by
      * adj/1000*size, §9.4.3) computed against the 0.5*size/char
      * fallback advance — the way many real writers emit table rows
      * (one BT, one TJ, kerning jumps between cells). The displayed
      * geometry is byte-for-byte the per-cell-Td variants'; a decoder
      * that ignores TJ number operands collapses all cells onto column
      * one and fails cell assignment.
      */
    def textRowTJ(y: Float, size: Float,
                  cells: Seq[(Float, String)]): Content = {
      require(scale == 1f && cmap == null && !hexStrings && !textState,
        "tjRows composes with the plain convention only")
      sb ++= s"BT /F1 ${fmt(size)} Tf ${fmt(cells.head._1)} ${fmt(y)} Td [ "
      var cur = cells.head._1
      for (((x, s), idx) <- cells.zipWithIndex) {
        if (idx > 0) sb ++= f"${-(x - cur) / size * 1000f}%.1f "
        sb ++= lit(s) + " "
        cur = x + s.length * 0.5f * size
      }
      sb ++= "] TJ ET\n"
      this
    }
    def text(x: Float, y: Float, size: Float, s: String): Content = {
      val op =
        if (cmap != null)
          // font-code bytes, not UTF-8: only a CMap-driven decoder
          // recovers the text (hex form sidesteps literal escaping);
          // wide cmaps emit two-byte Identity-H CID codes
          "<" + s.map(cmap.hex).mkString + ">"
        else if (hexStrings)
          "<" + s.getBytes("UTF-8").map(b => f"${b & 0xFF}%02X").mkString + ">"
        else
          "(" + s.replace("\\", "\\\\").replace("(", "\\(")
            .replace(")", "\\)") + ")"
      // textState: letterspaced-condensed layout — Tc = 0.2*size with
      // Tz 50 over the constant-800 /Widths font gives the effective
      // advance (0.8*size + 0.2*size) * 0.5 = 0.5*size, the same
      // DISPLAYED geometry as the plain variants; a decoder ignoring
      // Tc/Tz reads 0.8*size (60% overshoot) and mis-bins glyphs
      val ts = if (textState) s"${fmt(0.2f * size)} Tc 50 Tz " else ""
      sb ++= s"BT /F1 ${fmt(size)} Tf $ts${fmt(x)} ${fmt(y)} Td $op Tj ET\n"
      this
    }
    def fillRect(x: Float, y: Float, w: Float, h: Float): Content = {
      sb ++= s"${fmt(x)} ${fmt(y)} ${fmt(w)} ${fmt(h)} re f\n"
      this
    }
    def bytes: Array[Byte] = {
      val body = sb.toString
      val wrapped =
        if (scale == 1f) body
        else f"q $scale%.1f 0 0 $scale%.1f 0 0 cm\n" + body + "Q\n"
      wrapped.getBytes("UTF-8")
    }
  }

  /** The widths-variant synthetic metric table: /FirstChar 32, 95
    * entries over the ASCII range, per-1000 glyph units. Deterministic
    * and non-uniform so a decoder that ignores /Widths gets visibly
    * wrong x-advances; codes past 126 (the corpus's Cyrillic) fall
    * back to the 0.5 * size rule on both sides.
    */
  def synthWidth(code: Int): Int =
    if (code == 32) 278 else 400 + (code % 8) * 40

  /** Assemble a PDF from per-page content (MediaBox 0 0 612 792).
    * `compress` runs every content stream through Deflater
    * (/FlateDecode) — both forms must decode identically. `widths`
    * emits the font as an INDIRECT object carrying /FirstChar and a
    * ref-to-array /Widths ([[synthWidth]]) — the simple-font metric
    * convention real-world PDFs use (PDF 32000 §9.6.2).
    */
  /** Wrap deflated bytes as ASCIIHex text (72-col lines, `>` EOD) —
    * the /Filter [ /ASCIIHexDecode /FlateDecode ] chain form.
    */
  private def asciiHexEncode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(data.length * 2 + data.length / 36 + 2)
    for ((b, i) <- data.zipWithIndex) {
      sb ++= f"${b & 0xFF}%02X"
      if (i % 36 == 35) sb += '\n'
    }
    sb += '>'
    sb.toString.getBytes("ISO-8859-1")
  }

  /** PNG Up-filter predictor coding (§7.4.4.4 Predictor 12): rows of
    * `columns` bytes, each prefixed with tag 2 and stored as the delta
    * vs the previous row; the final partial row keeps its real length
    * (symmetric with PdfDecode.unpredict). Bytes grow by 1 per row.
    */
  private def pngPredictUp(raw: Array[Byte], columns: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(raw.length + raw.length / columns + 2)
    val prev = new Array[Int](columns)
    var i = 0
    while (i < raw.length) {
      val len = math.min(columns, raw.length - i)
      out.write(2) // Up
      var c = 0
      while (c < len) {
        val x = raw(i + c) & 0xFF
        out.write((x - prev(c)) & 0xFF)
        prev(c) = x
        c += 1
      }
      i += len
    }
    out.toByteArray
  }

  def pdf(pages: Seq[Content], compress: Boolean = false,
          widths: Boolean = false,
          hexChain: Boolean = false,
          rotate90: Boolean = false,
          predictor: Boolean = false,
          cmapEnc: CmapCodes = null,
          textState: Boolean = false): Array[Byte] = {
    val n = pages.size
    // objects: 1 catalog, 2 pages, then per page i: (3+2i) page,
    // (4+2i) content; widths variant appends (3+2n) font, (4+2n) widths
    val fontObjNum = 3 + 2 * n
    val objs = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
    def obj(num: Int, body: String): Array[Byte] =
      s"$num 0 obj\n$body\nendobj\n".getBytes("ISO-8859-1")
    objs += obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    // rotate90: a landscape 792x612 box displayed upright via
    // /Rotate 90 on each page — the scanned-filing layout. Content is
    // authored in display space and wrapped in the inverse rotation
    // ([0 1 -1 0 792 0]: (dx,dy) -> (792-dy, dx)), so the DISPLAYED
    // document is byte-for-byte the same geometry as the portrait
    // variants — only a /Rotate-normalizing decoder recovers it.
    objs += obj(2,
      s"<< /Type /Pages /Kids [ $kids ] /Count $n " +
        (if (rotate90) "/MediaBox [ 0 0 792 612 ] >>"
         else "/MediaBox [ 0 0 612 792 ] >>"))
    val fontRes =
      if (widths || cmapEnc != null || textState) s"/F1 $fontObjNum 0 R"
      else "/F1 << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for ((c, i) <- pages.zipWithIndex) {
      objs += obj(3 + 2 * i,
        s"<< /Type /Page /Parent 2 0 R /Contents ${4 + 2 * i} 0 R " +
          (if (rotate90) "/Rotate 90 " else "") +
          s"/Resources << /Font << $fontRes >> >> >>")
      val raw =
        if (rotate90)
          ("q 0 1 -1 0 792 0 cm\n".getBytes("ISO-8859-1") ++ c.bytes ++
            "Q\n".getBytes("ISO-8859-1"))
        else c.bytes
      val (data, filter) =
        if (predictor)
          // Predictor-12-coded Flate content: the /DecodeParms
          // convention XRef streams carry in virtually every real
          // PDF 1.5 file, applied here to a content stream so the
          // decode path is exercised end-to-end
          (deflate(pngPredictUp(raw, 24)),
            " /Filter /FlateDecode /DecodeParms " +
              "<< /Predictor 12 /Columns 24 >>")
        else if (hexChain)
          (asciiHexEncode(deflate(raw)),
            " /Filter [ /ASCIIHexDecode /FlateDecode ]")
        else if (compress) (deflate(raw), " /Filter /FlateDecode")
        else (raw, "")
      val head = s"${4 + 2 * i} 0 obj\n<< /Length ${data.length}$filter >>\nstream\n"
      val buf = new ByteArrayOutputStream()
      buf.write(head.getBytes("ISO-8859-1"))
      buf.write(data)
      buf.write("\nendstream\nendobj\n".getBytes("ISO-8859-1"))
      objs += buf.toByteArray
    }
    if (widths) {
      objs += obj(fontObjNum,
        "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
          s"/FirstChar 32 /LastChar 126 /Widths ${fontObjNum + 1} 0 R >>")
      objs += obj(fontObjNum + 1,
        (32 to 126).map(synthWidth).mkString("[ ", " ", " ]"))
    } else if (textState) {
      // constant-800 widths: with the content's Tc/Tz ops the pair is
      // only consistent under a §9.4.4-complete advance computation
      objs += obj(fontObjNum,
        "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
          s"/FirstChar 32 /LastChar 126 /Widths ${fontObjNum + 1} 0 R >>")
      objs += obj(fontObjNum + 1,
        (32 to 126).map(_ => 800).mkString("[ ", " ", " ]"))
    } else if (cmapEnc != null && cmapEnc.wide) {
      // composite Identity-H font (§9.7.4): /Type0 -> CIDFontType2
      // descendant carrying /W + /DW glyph metrics, /ToUnicode CMap
      // over two-byte CID codes. /W exercises BOTH §9.7.4.3 entry
      // forms — a consecutive `c [w..]` block and a `cFirst cLast w`
      // range — with every width 500 (= the 0.5*size fallback) so the
      // displayed geometry is byte-for-byte the other variants'.
      objs += obj(fontObjNum,
        "<< /Type /Font /Subtype /Type0 /BaseFont /GraftCID " +
          "/Encoding /Identity-H " +
          s"/DescendantFonts [ ${fontObjNum + 1} 0 R ] " +
          s"/ToUnicode ${fontObjNum + 2} 0 R >>")
      val maxCid = cmapEnc.entries.map(_._1).max
      val wTail = if (maxCid >= 4) s" 4 $maxCid 500" else ""
      objs += obj(fontObjNum + 1,
        "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GraftCID " +
          "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) " +
          "/Supplement 0 >> /DW 500 " +
          s"/W [ 1 [ 500 500 500 ]$wTail ] >>")
      val bfBlocks = cmapEnc.entries.grouped(100).map { grp =>
        val lines = grp
          .map { case (code, ch) => f"<$code%04X> <${ch.toInt}%04X>" }
          .mkString("\n")
        s"${grp.size} beginbfchar\n$lines\nendbfchar\n"
      }.mkString
      val cmapText =
        ("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n" +
          "/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) " +
          "/Supplement 0 >> def\n/CMapName /GraftCidToUnicode def\n" +
          "/CMapType 2 def\n" +
          "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
          bfBlocks +
          "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
          .getBytes("ISO-8859-1")
      val buf = new ByteArrayOutputStream()
      buf.write((s"${fontObjNum + 2} 0 obj\n" +
        s"<< /Length ${cmapText.length} >>\nstream\n").getBytes("ISO-8859-1"))
      buf.write(cmapText)
      buf.write("\nendstream\nendobj\n".getBytes("ISO-8859-1"))
      objs += buf.toByteArray
    } else if (cmapEnc != null) {
      // embedded-subset font: custom single-byte encoding + /ToUnicode
      // CMap stream (identity bfrange for ASCII, bfchar per subset code)
      objs += obj(fontObjNum,
        "<< /Type /Font /Subtype /TrueType /BaseFont /GraftSubset " +
          s"/ToUnicode ${fontObjNum + 1} 0 R >>")
      val bfchars = cmapEnc.entries
        .map { case (code, ch) => f"<$code%02X> <${ch.toInt}%04X>" }
        .mkString("\n")
      val cmapText =
        ("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n" +
          "/CMapName /GraftToUnicode def\n" +
          "1 begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
          "1 beginbfrange\n<20> <7E> <0020>\nendbfrange\n" +
          s"${cmapEnc.entries.size} beginbfchar\n$bfchars\nendbfchar\n" +
          "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
          .getBytes("ISO-8859-1")
      val buf = new ByteArrayOutputStream()
      buf.write((s"${fontObjNum + 1} 0 obj\n" +
        s"<< /Length ${cmapText.length} >>\nstream\n").getBytes("ISO-8859-1"))
      buf.write(cmapText)
      buf.write("\nendstream\nendobj\n".getBytes("ISO-8859-1"))
      objs += buf.toByteArray
    }
    // assemble with a correct xref (PdfDecode scans, but the file is a
    // structurally valid PDF a standard reader accepts)
    val out = new ByteArrayOutputStream()
    out.write("%PDF-1.4\n".getBytes("ISO-8859-1"))
    val offsets = new scala.collection.mutable.ArrayBuffer[Int]
    for (o <- objs) { offsets += out.size(); out.write(o) }
    val xrefAt = out.size()
    val xref = new StringBuilder
    xref ++= s"xref\n0 ${objs.size + 1}\n0000000000 65535 f \n"
    for (off <- offsets) xref ++= f"$off%010d 00000 n \n"
    xref ++= s"trailer\n<< /Size ${objs.size + 1} /Root 1 0 R >>\n"
    xref ++= s"startxref\n$xrefAt\n%%EOF\n"
    out.write(xref.toString.getBytes("ISO-8859-1"))
    out.toByteArray
  }

  /** Assemble the same document as PDF 1.5: every NON-stream object
    * (catalog, page tree, page dicts, font + widths array) packed into
    * one Flate-compressed /ObjStm, content streams top-level, and a
    * cross-reference STREAM (/Type /XRef, W [1 3 2], type-1/type-2
    * entries) instead of the classic xref table — the convention
    * virtually every post-2006 real-world writer emits. Must decode
    * identically to the classic form.
    */
  def pdfObjStm(pages: Seq[Content],
                widths: Boolean = false): Array[Byte] = {
    val n = pages.size
    val fontObjNum = 3 + 2 * n
    val packed = new scala.collection.mutable.ArrayBuffer[(Int, String)]
    packed += 1 -> "<< /Type /Catalog /Pages 2 0 R >>"
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    packed += 2 ->
      (s"<< /Type /Pages /Kids [ $kids ] /Count $n " +
        "/MediaBox [ 0 0 612 792 ] >>")
    val fontRes =
      if (widths) s"/F1 $fontObjNum 0 R"
      else "/F1 << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for (i <- 0 until n)
      packed += (3 + 2 * i) ->
        (s"<< /Type /Page /Parent 2 0 R /Contents ${4 + 2 * i} 0 R " +
          s"/Resources << /Font << $fontRes >> >> >>")
    if (widths) {
      packed += fontObjNum ->
        ("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
          s"/FirstChar 32 /LastChar 126 /Widths ${fontObjNum + 1} 0 R >>")
      packed += (fontObjNum + 1) ->
        (32 to 126).map(synthWidth).mkString("[ ", " ", " ]")
    }
    val objStmNum = fontObjNum + (if (widths) 2 else 0)
    val xrefNum = objStmNum + 1

    val bodies = packed.map(_._2)
    val offs = bodies.scanLeft(0)((acc, b) => acc + b.length + 1).init
    val header = packed.map(_._1).zip(offs)
      .map { case (num, off) => s"$num $off" }.mkString(" ") + "\n"
    val payload = deflate(
      (header + bodies.mkString("\n") + "\n").getBytes("ISO-8859-1"))

    val out = new ByteArrayOutputStream()
    out.write("%PDF-1.5\n".getBytes("ISO-8859-1"))
    val topOffsets = scala.collection.mutable.Map[Int, Int]()
    def streamObj(num: Int, dict: String, data: Array[Byte]): Unit = {
      topOffsets(num) = out.size()
      out.write(s"$num 0 obj\n$dict\nstream\n".getBytes("ISO-8859-1"))
      out.write(data)
      out.write("\nendstream\nendobj\n".getBytes("ISO-8859-1"))
    }
    for ((c, i) <- pages.zipWithIndex) {
      val data = deflate(c.bytes)
      streamObj(4 + 2 * i,
        s"<< /Length ${data.length} /Filter /FlateDecode >>", data)
    }
    streamObj(objStmNum,
      s"<< /Type /ObjStm /N ${packed.size} /First ${header.length} " +
        s"/Filter /FlateDecode /Length ${payload.length} >>", payload)

    // the XRef stream indexes itself, so record its offset first
    val xrefAt = out.size()
    topOffsets(xrefNum) = xrefAt
    val packedIndex = packed.map(_._1).zipWithIndex.toMap
    val rows = new ByteArrayOutputStream()
    def row(t: Int, f2: Int, f3: Int): Unit = {
      rows.write(t)
      rows.write((f2 >> 16) & 0xFF); rows.write((f2 >> 8) & 0xFF)
      rows.write(f2 & 0xFF)
      rows.write((f3 >> 8) & 0xFF); rows.write(f3 & 0xFF)
    }
    for (num <- 0 to xrefNum) {
      if (num == 0) row(0, 0, 0xFFFF)
      else packedIndex.get(num) match {
        case Some(idx) => row(2, objStmNum, idx)
        case None => row(1, topOffsets.getOrElse(num, 0), 0)
      }
    }
    val xrefData = rows.toByteArray
    streamObj(xrefNum,
      s"<< /Type /XRef /Size ${xrefNum + 1} /W [ 1 3 2 ] /Root 1 0 R " +
        s"/Length ${xrefData.length} >>", xrefData)
    out.write(s"startxref\n$xrefAt\n%%EOF\n".getBytes("ISO-8859-1"))
    out.toByteArray
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val k = d.deflate(buf)
      out.write(buf, 0, k)
    }
    d.end()
    out.toByteArray
  }

  // ---------- the q64 stakeholder corpus document ----------

  /** Grid geometry shared by synth and oracle derivation: 7 horizontal
    * rules (6 rows) x 5 vertical rules (4 columns) spanning >=90% of
    * the 612pt page — exactly the reference's grid-selection envelope.
    */
  private val vxs = Seq(20f, 168f, 316f, 464f, 592f)
  private val hys = Seq(700f, 660f, 620f, 580f, 540f, 500f, 460f)

  private def grid(c: Content): Content = {
    for (y <- hys) c.fillRect(20f, y, 572f, 1f)
    for (x <- vxs) c.fillRect(x, 460f, 1f, 240f)
    c
  }

  /** Write one table row (cells at font 6, inside row r's band) —
    * per-cell Td texts, or one kerning-jump TJ array when the content
    * is in tjRows mode.
    */
  private def row(c: Content, r: Int, cells: Seq[String]): Content = {
    val y = hys(r) - 20f
    val placed = cells.zipWithIndex.collect {
      case (s, col) if s.nonEmpty => (vxs(col) + 3f, s)
    }
    if (c.tjRows && placed.nonEmpty) c.textRowTJ(y, 6f, placed)
    else { for ((x, s) <- placed) c.text(x, y, 6f, s); c }
  }

  /** The q64 stakeholder filing for id i: page 1 carries the start
    * marker + title row + the reference's numeric row (skipped via the
    * skip-next-row quirk) + 3 data rows + a held-back last row; page 2
    * opens with the blank-first-cell continuation row that stitches the
    * held row (P7), then 4 data rows and a final held row; page 3
    * carries the end marker, so the final held row is emitted by the
    * end-of-pages flush. 9 stakeholders total — pinned in PdfDecodeSpec
    * and the q64 oracle.
    */
  def stakeholderPdf(i: Int, compress: Boolean = false,
                     scale: Float = 1f,
                     hexStrings: Boolean = false,
                     widths: Boolean = false,
                     objStm: Boolean = false,
                     hexChain: Boolean = false,
                     rotate90: Boolean = false,
                     predictor: Boolean = false,
                     cmapEncoded: Boolean = false,
                     identityH: Boolean = false,
                     textState: Boolean = false,
                     tjRows: Boolean = false): Array[Byte] = {
    val cmapCodes =
      if (identityH) new CmapCodes(wide = true)
      else if (cmapEncoded) new CmapCodes
      else null
    def content =
      new Content(scale, hexStrings, cmapCodes, textState, tjRows)
    val p1 = content
    p1.text(30f, 750f, 10f, "Состав аффилированных лиц")
    grid(p1)
    row(p1, 0, Seq("Полное фирменное наименование", "Основание",
      "Дата наступления основания", "Доля участия"))
    row(p1, 1, Seq("1", "2", "3", "4"))
    for (r <- 0 until 3)
      row(p1, 2 + r, Seq(s"ООО Компания $i $r",
        "1.создание общества 2.приобретение акций",
        "01.02.2020 03.04.2021", s"25,$r"))
    row(p1, 5, Seq(s"ООО Гамма $i", "1.создание", "01.02.2020", "10"))

    val p2 = content
    grid(p2)
    row(p2, 0, Seq("", " 2.продажа акций", " 03.04.2021", ""))
    for (r <- 0 until 4)
      row(p2, 1 + r, Seq(s"АО Дельта $i ${3 + r}", "владение долей",
        "05.06.2021", s"${3 + r},5"))
    row(p2, 5, Seq(s"ПАО Омега $i", "реорганизация", "31.12.2019", "100"))

    val p3 = content
    p3.text(30f, 750f, 10f,
      "Изменения, произошедшие в списке аффилированных лиц")

    if (objStm) pdfObjStm(Seq(p1, p2, p3), widths)
    else pdf(Seq(p1, p2, p3), compress, widths, hexChain, rotate90,
      predictor, cmapCodes, textState)
  }
}
