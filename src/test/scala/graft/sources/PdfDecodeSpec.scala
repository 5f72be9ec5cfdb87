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

  test("cm-scaled and hex-string variants decode IDENTICALLY to the " +
    "plain convention (the r05 real-world convention gate)") {
    val plain = PdfDecode.pages(PdfSynth.stakeholderPdf(7))
    val scaled = PdfDecode.pages(
      PdfSynth.stakeholderPdf(7, compress = true, scale = 2f))
    val hexed = PdfDecode.pages(PdfSynth.stakeholderPdf(7, hexStrings = true))
    assert(scaled == plain,
      "CTM-folded geometry must equal the untransformed decode")
    assert(hexed == plain,
      "hex string operands must equal literal-string decode")
    // q/Q restore: a transform inside q..Q must not leak past the Q
    val p = PdfDecode.interpret(
      ("q 2 0 0 2 0 0 cm BT /F1 5 Tf 50 100 Td (A) Tj ET Q\n" +
        "BT /F1 10 Tf 100 200 Td (B) Tj ET\n" +
        "q 1 0 0 1 30 40 cm 10 20 5 5 re f Q\n").getBytes("UTF-8"))
    val gs = p.lines.flatMap(_.glyphs)
    assert(gs.exists(g => g.text == "A" && g.x == 100f && g.y == 200f))
    assert(gs.exists(g => g.text == "B" && g.x == 100f && g.y == 200f))
    assert(p.rects == Seq(PdfTable.Rect(40f, 60f, 5f, 5f)))
    // hex parsing details: whitespace inside is skipped; an odd digit
    // count pads the final low nibble with 0 (PDF 32000 §7.3.4.3)
    val hp = PdfDecode.interpret(
      "BT /F1 10 Tf 0 0 Td <41 4 2> Tj ET".getBytes("UTF-8"))
    assert(hp.lines.head.glyphs.map(_.text).mkString == "AB",
      hp.lines.head.glyphs) // "41 4 2" -> 0x41 'A', 0x42 'B'
    val odd = PdfDecode.interpret(
      "BT /F1 10 Tf 0 0 Td <414> Tj ET".getBytes("UTF-8"))
    assert(odd.lines.head.glyphs.map(_.text).mkString == "A@",
      odd.lines.head.glyphs) // "414" -> 0x41 'A', 0x40 '@'
  }

  test("/Widths font metrics drive per-glyph advances (ref-to-array " +
    "form); codes past /LastChar keep the 0.5 fallback") {
    val c = new PdfSynth.Content
    c.text(100f, 500f, 10f, "AB ж") // ASCII from the table, Cyrillic falls back
    val bytes = PdfSynth.pdf(Seq(c), widths = true)
    val gs = PdfDecode.pages(bytes).head.lines.head.glyphs
    assert(gs.map(_.text) == Seq("A", "B", " ", "ж"))
    val wA = PdfSynth.synthWidth('A') / 1000f * 10f // 440 -> 4.4
    val wB = PdfSynth.synthWidth('B') / 1000f * 10f
    val wSp = PdfSynth.synthWidth(' ') / 1000f * 10f // 278 -> 2.78
    assert(gs(1).x == 100f + wA)
    assert(gs(2).x == 100f + wA + wB)
    assert(gs(3).x == 100f + wA + wB + wSp)
    // without a widths table the same content keeps the 0.5 rule
    val plain = PdfDecode.pages(PdfSynth.pdf(Seq(c))).head
    assert(plain.lines.head.glyphs(1).x == 105f)
  }

  test("/Filter chains: ASCIIHex+Flate array decodes identically; " +
    "hex and 85 codecs match their §7.4 vectors") {
    val plain = PdfDecode.pages(PdfSynth.stakeholderPdf(8))
    val chained = PdfDecode.pages(PdfSynth.stakeholderPdf(8, hexChain = true))
    assert(chained == plain,
      "[/ASCIIHexDecode /FlateDecode] must be invisible at page level")
    // filter-entry parsing: name form, array form, absent
    assert(PdfDecode.filterNames("<< /Length 5 /Filter /FlateDecode >>") ==
      Seq("/FlateDecode"))
    assert(PdfDecode.filterNames(
      "<< /Filter [ /ASCIIHexDecode /FlateDecode ] /Length 5 >>") ==
      Seq("/ASCIIHexDecode", "/FlateDecode"))
    assert(PdfDecode.filterNames("<< /Length 5 >>").isEmpty)
    // ASCIIHexDecode: whitespace skipped, > EOD, odd digit pads 0
    assert(PdfDecode.asciiHexDecode("41 4\n24>".getBytes)
      .sameElements("AB@".getBytes))
    assert(PdfDecode.asciiHexDecode("474>anything after EOD is ignored"
      .getBytes("ISO-8859-1")).sameElements(Array[Byte](0x47, 0x40)))
    intercept[IllegalArgumentException] {
      PdfDecode.asciiHexDecode("4G>".getBytes)
    }
    // ASCII85Decode: the canonical "sure" vector, z shorthand, EOD
    assert(new String(PdfDecode.ascii85Decode("F*2M7~>".getBytes), "UTF-8")
      == "sure")
    assert(PdfDecode.ascii85Decode("z~>".getBytes)
      .sameElements(Array[Byte](0, 0, 0, 0)))
    // partial final group: 3 chars -> 2 bytes ("su")
    assert(new String(PdfDecode.ascii85Decode("F*2~>".getBytes), "UTF-8")
      == "su")
    intercept[IllegalArgumentException] {
      PdfDecode.ascii85Decode("abzcd~>".getBytes) // z inside a group
    }
  }

  test("/Rotate 90 landscape pages normalize to upright display " +
    "geometry (identical pages, display width, full pipeline)") {
    val plain = PdfDecode.pages(PdfSynth.stakeholderPdf(6, compress = true))
    val rotBytes = PdfSynth.stakeholderPdf(6, compress = true, rotate90 = true)
    val rotated = PdfDecode.pages(rotBytes)
    assert(rotated == plain,
      "/Rotate-normalized geometry must equal the portrait decode")
    // display width: 792x612 landscape box + /Rotate 90 -> 612 upright
    assert(PdfDecode.pageWidth(rotBytes) == 612f)
    val sts = graft.core.PdfTable.parseStakeholderPages(rotated, 612f)
    assert(sts.size == 9, sts.map(_.name))
    // quarter-turn corner mapping, straight from the initial-CTM table
    val r = PdfDecode.interpret(
      "10 20 30 5 re f\nBT /F1 10 Tf 100 200 Td (A) Tj ET".getBytes("UTF-8"),
      rotate = 90, mediaW = 792f, mediaH = 612f)
    assert(r.rects == Seq(graft.core.PdfTable.Rect(20f, 752f, 5f, 30f)))
    val g = r.lines.head.glyphs.head
    assert(g.text == "A" && g.x == 200f && g.y == 692f)
  }

  test("PDF 1.5 object streams: packed page tree + XRef stream file " +
    "decodes identically to the classic-xref form") {
    val classic = PdfDecode.pages(
      PdfSynth.stakeholderPdf(9, widths = true))
    val packed = PdfDecode.pages(
      PdfSynth.stakeholderPdf(9, widths = true, objStm = true))
    assert(packed == classic,
      "ObjStm-packed objects must be invisible at the Page level")
    assert(PdfDecode.pageWidth(
      PdfSynth.stakeholderPdf(9, widths = true, objStm = true)) == 612f)
    // the full geometry pipeline over the ObjStm file
    val sts = graft.core.PdfTable.parseStakeholderPages(packed, 612f)
    assert(sts.size == 9, sts.map(_.name))
  }

  test("/Predictor: PNG-filtered and TIFF-differenced Flate streams " +
    "reverse exactly; Predictor-12 file decodes identically") {
    // unit net over every PNG row filter + TIFF 2, incl. a partial
    // final row and bpp > 1 (Paeth neighborhood across components)
    val parms = PdfDecode.PredictorParms(12, 1, 8, 4)
    val raw = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 95)
    def enc(tag: Int, rows: Array[Byte]): Array[Byte] = {
      // re-encode by brute force: apply the inverse of each decode rule
      val out = new java.io.ByteArrayOutputStream()
      val prev = new Array[Int](4)
      var i = 0
      while (i < rows.length) {
        val len = math.min(4, rows.length - i)
        out.write(tag)
        val cur = new Array[Int](4)
        for (c <- 0 until len) {
          val x = rows(i + c) & 0xFF
          cur(c) = x
          val a = if (c >= 1) cur(c - 1) else 0
          val b = prev(c)
          val cc = if (c >= 1) prev(c - 1) else 0
          val pred = tag match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) / 2
            case 4 =>
              val pp = a + b - cc
              val pa = math.abs(pp - a); val pb = math.abs(pp - b)
              val pc = math.abs(pp - cc)
              if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc
          }
          out.write((x - pred) & 0xFF)
        }
        System.arraycopy(cur, 0, prev, 0, 4)
        i += len
      }
      out.toByteArray
    }
    for (tag <- 0 to 4)
      assert(PdfDecode.unpredict(enc(tag, raw), parms).sameElements(raw),
        s"PNG filter $tag must round-trip")
    // TIFF 2: horizontal differencing, 2 components per pixel
    val tiff = PdfDecode.PredictorParms(2, 2, 8, 3)
    val diffed = Array[Byte](5, 7, 3, 2, 1, 1, 10, 20, 5, 5, 5, 5)
    val plain = PdfDecode.unpredict(diffed, tiff)
    assert(plain.sameElements(
      Array[Byte](5, 7, 8, 9, 9, 10, 10, 20, 15, 25, 20, 30)))
    // /DecodeParms array form aligned with a filter chain
    val ps = PdfDecode.decodeParms(
      "<< /Filter [ /ASCIIHexDecode /FlateDecode ] /DecodeParms " +
        "[ null << /Predictor 12 /Columns 24 >> ] >>", 2)
    assert(ps == Seq(PdfDecode.PredictorParms(1, 1, 8, 1),
      PdfDecode.PredictorParms(12, 1, 8, 24)))
    // the whole file: Predictor-12 content streams decode identically
    val plainPdf = PdfDecode.pages(PdfSynth.stakeholderPdf(8))
    val predPdf = PdfDecode.pages(
      PdfSynth.stakeholderPdf(8, predictor = true))
    assert(predPdf == plainPdf,
      "Predictor-coded Flate must equal the uncoded decode")
    val sts = PdfTable.parseStakeholderPages(predPdf, 612f)
    assert(sts.size == 9, sts.map(_.name))
  }

  test("/ToUnicode CMap: custom-encoded subset font decodes " +
    "identically to the UTF-8 convention (bfchar + bfrange)") {
    // unit net: bfchar pairs, bfrange increment, bfrange array form
    val cmap = PdfDecode.parseToUnicode(
      ("2 beginbfchar\n<80> <0421>\n<81> <04220430>\nendbfchar\n" +
        "2 beginbfrange\n<41> <43> <0061>\n" +
        "<50> <51> [ <0058> <0059> ]\nendbfrange\n").getBytes("ISO-8859-1"))
    assert(cmap(0x80) == "С" && cmap(0x81) == "Та")
    assert(cmap(0x41) == "a" && cmap(0x42) == "b" && cmap(0x43) == "c")
    assert(cmap(0x50) == "X" && cmap(0x51) == "Y")
    assert(!cmap.contains(0x44))
    // the whole file: Cyrillic rides as custom single-byte codes that
    // only a CMap-driven decoder recovers — a UTF-8 decode of the
    // string bytes would be mojibake
    val plain = PdfDecode.pages(PdfSynth.stakeholderPdf(2))
    val cmapped = PdfDecode.pages(
      PdfSynth.stakeholderPdf(2, cmapEncoded = true))
    assert(cmapped == plain,
      "CMap-encoded decode must equal the UTF-8-convention decode")
    val sts = PdfTable.parseStakeholderPages(cmapped, 612f)
    assert(sts.size == 9, sts.map(_.name))
    assert(sts(0).name == "ООО Компания 2 0")
  }

  test("literal-string escapes: octal, control shorthands and " +
      "backslash-EOL continuation (§7.3.4.2)") {
    def text(content: String): String =
      PdfDecode.interpret(content.getBytes("ISO-8859-1")).lines
        .flatMap(_.glyphs).map(_.text).mkString
    assert(text("BT /F1 10 Tf 0 700 Td (A\\053B) Tj ET") == "A+B")
    assert(text("BT /F1 10 Tf 0 700 Td (a\\\\b\\(c\\)) Tj ET") == "a\\b(c)")
    // continuation: the split string reads as one, no inserted char
    assert(text("BT /F1 10 Tf 0 700 Td (split\\\nhere) Tj ET") ==
      "splithere")
    assert(text("BT /F1 10 Tf 0 700 Td (crlf\\\r\nx) Tj ET") == "crlfx")
  }

  test("kerning-jump TJ rows: one TJ array per table row decodes to " +
      "the same stakeholders; ignoring the jumps would collapse columns") {
    val sts = PdfTable.parseStakeholderPages(
      PdfDecode.pages(PdfSynth.stakeholderPdf(5, tjRows = true)), 612f)
    assert(sts.size == 9, sts.map(_.name))
    assert(sts(0).name == "ООО Компания 5 0" && sts(0).share != null)
    assert(sts(8).name == "ПАО Омега 5")
    // discrimination: strip the number operands from every TJ array —
    // what a TJ-adjustment-ignoring decoder computes — and the glyph
    // line span collapses to adjacent text (columns lost)
    val c = new PdfSynth.Content(tjRows = true)
    c.textRowTJ(500f, 6f, Seq((23f, "abc"), (171f, "def")))
    val full = PdfDecode.interpret(c.bytes)
    val stripped = new String(c.bytes, "ISO-8859-1")
      .replaceAll("""[-\d.]+ \(""", "(")
    val flat = PdfDecode.interpret(stripped.getBytes("ISO-8859-1"))
    def startXs(p: graft.core.PdfTable.Page) =
      p.lines.flatMap(_.glyphs).map(_.x)
    assert(math.abs(startXs(full)(3) - 171f) < 0.01f, // 'd' at column 2
      startXs(full).toString)
    assert(startXs(flat)(3) < 40f, "stripped TJ must collapse columns")
  }

  test("Identity-H: two-byte CID codes through /DescendantFonts /W " +
    "decode identically to the UTF-8 convention") {
    // unit net: /W parses both §9.7.4.3 entry forms, clamps a corrupt
    // giant range, and an inline nested array is sliced whole
    val w = PdfDecode.parseCidWidths("1 [ 500 600 ] 4 6 750")
    assert(w == Map(1 -> 500f, 2 -> 600f, 4 -> 750f, 5 -> 750f,
      6 -> 750f))
    assert(PdfDecode.parseCidWidths("0 16777215 500").size == 0x10000,
      "corrupt giant range must clamp, not materialize 16M entries")
    // the whole file: every char (ASCII included) rides as a two-byte
    // first-use-order CID — a UTF-8 or single-byte decode reads pure
    // noise; only the Type0/Identity-H path recovers any text
    val plain = PdfDecode.pages(PdfSynth.stakeholderPdf(3))
    val cid = PdfDecode.pages(
      PdfSynth.stakeholderPdf(3, identityH = true))
    assert(cid == plain,
      "Identity-H decode must equal the UTF-8-convention decode")
    val sts = PdfTable.parseStakeholderPages(cid, 612f)
    assert(sts.size == 9, sts.map(_.name))
    assert(sts(0).name == "ООО Компания 3 0")
    assert(sts(8).name == "ПАО Омега 3")
  }

  test("Tc/Tw/Tz: the letterspaced-condensed layout decodes to the " +
    "same stakeholders; Tw shifts only spaces; q/Q restores all three") {
    // the full-file gate: constant-800 widths + (Tc=0.2*size, Tz 50)
    // give the same DISPLAYED geometry as the plain variant — the
    // stakeholder parse must agree exactly
    val sts = PdfTable.parseStakeholderPages(
      PdfDecode.pages(PdfSynth.stakeholderPdf(4, textState = true)),
      612f)
    assert(sts.size == 9, sts.map(_.name))
    assert(sts(0).name == "ООО Компания 4 0" && sts(0).share != null)
    assert(sts(8).name == "ПАО Омега 4")
    // unit net on the interpreter: Tw applies to code 32 only; the "
    // operator sets Tw/Tc inline; Q restores the pre-q text state
    def xs(content: String): Seq[Float] =
      PdfDecode.interpret(content.getBytes("ISO-8859-1")).lines
        .flatMap(_.glyphs).map(_.x)
    val plain = xs("BT /F1 10 Tf 0 700 Td (a b) Tj ET")
    val spaced = xs("BT /F1 10 Tf 6 Tw 0 700 Td (a b) Tj ET")
    assert(plain.size == 3 && spaced.size == 3)
    assert(spaced(1) == plain(1), "Tw must not move the pre-space glyph")
    assert(spaced(2) == plain(2) + 6f, "Tw shifts the post-space glyph")
    val viaQuote = xs("BT /F1 10 Tf 2 TL 0 700 Td 6 0 (a b) \" ET")
    assert(viaQuote(2) - viaQuote(0) == (spaced(2) - spaced(0)),
      "the \" operator must set Tw before showing")
    val restored = xs(
      "BT /F1 10 Tf q 4 Tc 200 Tz Q 0 700 Td (ab) Tj ET")
    assert(restored(1) - restored(0) == plain(1) - plain(0),
      "Q must restore Tc/Tz saved by q")
    // hScale halves advances AND TJ adjustments symmetrically
    val tz = xs("BT /F1 10 Tf 50 Tz 0 700 Td [(ab) -1000 (c)] TJ ET")
    assert(tz(1) - tz(0) == (plain(1) - plain(0)) / 2f)
    assert(tz(2) - tz(1) == (plain(1) - plain(0)) / 2f + 5f)
    // discrimination: the corpus variant is NOT passable by a decoder
    // that ignores the spacing terms — stripping the Tc/Tz ops from
    // the same content (= what such a decoder effectively computes,
    // 0.8*size advances) must change the parsed stakeholders
    val c = new PdfSynth.Content(textState = true)
    c.text(30f, 750f, 10f, "01.02.2020 03.04.2021")
    val withOps = PdfDecode.interpret(c.bytes,
      fonts = Map("F1" -> PdfDecode.FontInfo(
        Some(PdfDecode.FontWidths(32, Array.fill(95)(800f))), None)))
    val stripped = new String(c.bytes, "ISO-8859-1")
      .replaceAll("""[-\d.]+ Tc |[-\d.]+ Tz """, "")
    val noOps = PdfDecode.interpret(stripped.getBytes("ISO-8859-1"),
      fonts = Map("F1" -> PdfDecode.FontInfo(
        Some(PdfDecode.FontWidths(32, Array.fill(95)(800f))), None)))
    val spanOf = (p: graft.core.PdfTable.Page) => {
      val g = p.lines.flatMap(_.glyphs); g.map(_.x).max - g.map(_.x).min
    }
    assert(spanOf(noOps) > spanOf(withOps) * 1.5f,
      "a Tc/Tz-ignoring decode must overshoot the line span")
  }

  test("\\r-only EOLs: a CR-terminated file decodes identically to the " +
    "LF form (hand-flipped bytes, not a Synth convention)") {
    // PDF 32000 §7.5.1 allows CR, LF or CRLF as the EOL marker. The
    // Synth writers emit LF everywhere, so this convention is pinned by
    // mutating REAL bytes: with compress=false every 0x0A in the file
    // is structural (no Flate payload, and UTF-8 literals never contain
    // 0x0A), so a whole-file CR swap is the exact \r-only layout an
    // old-Mac writer produces — same byte count, so /Length stays valid.
    val lf = PdfSynth.stakeholderPdf(3, compress = false)
    assert(lf.count(_ == '\n'.toByte) > 50, "fixture must be LF-rich")
    val cr = lf.map(b => if (b == '\n'.toByte) '\r'.toByte else b)
    assert(PdfDecode.pages(cr) == PdfDecode.pages(lf),
      "CR-only EOLs must not change the decoded pages")
    val sts = PdfTable.parseStakeholderPages(PdfDecode.pages(cr), 612f)
    assert(sts.size == 9, sts.map(_.name))
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

  test("2-digit bfchar destinations left-pad to one UTF-16 code unit " +
      "instead of dropping the glyph (ADVICE r05)") {
    val cmap = PdfDecode.parseToUnicode(
      "1 beginbfchar\n<01> <41>\nendbfchar\n".getBytes("ISO-8859-1"))
    assert(cmap(0x01) == "A")
  }
}
