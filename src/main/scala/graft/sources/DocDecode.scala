package graft.sources

import graft.core._
import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Real DOC (MS-DOC / Word 97 binary) structural decode with JDK-only
  * parts — the format the reference opens through POI's HWPF
  * (`DocumentParser.java:109-209`). Built on [[CfbDecode]] for the OLE2
  * container; this file implements the published MS-DOC structures the
  * DOC extraction path needs:
  *
  *   - FIB (WordDocument stream): wIdent/nFib validation, the
  *     fWhichTblStm bit selecting 0Table/1Table, ccpText, and the
  *     fcClx / fcPlcfBteChpx / fcPlcfBtePapx pointers into the table
  *     stream;
  *   - piece table (Clx -> PlcPcd): CP ranges -> file offsets, with the
  *     fCompressed bit selecting cp1252 single-byte vs UTF-16LE pieces
  *     (the `range.getParagraph(i).text()` content POI reconstructs);
  *   - character runs (PlcfBteChpx -> CHPX FKPs): per-run explicit bold
  *     (sprmCFBold 0x0835) — the attribute behind the DOC header
  *     predicate's per-run bold test (`DocumentParser.java:839-858`);
  *   - paragraph properties (PlcfBtePapx -> PAPX FKPs): justification
  *     (sprmPJc 0x2403 — header route `:828-832`), left indent
  *     (sprmPDxaLeft 0x840F -> indentRatio, `:824-826`), page-break-
  *     before (sprmPPageBreakBefore 0x2407 -> CanBeHeader.Must).
  *
  * Output is the segmenter's DOC-dialect [[graft.core.Element]] stream
  * (docDialect = true), i.e. the same input contract the `^D` fixture
  * markup produces — so the entire A1 fold, gd golden suite, and
  * doc-type classification run unchanged on REAL .doc bytes.
  *
  * Documented deltas vs full HWPF: table cells (0x07 cell marks) are
  * treated as paragraph marks (flattened, like the nested-table note in
  * [[OoxmlDecode]]); DOC list numbering (PlfLst/PlfLfo) and section
  * properties are not decoded — listRef is never set and indentRatio
  * uses the default 12240-twip page width. Both are attribute deltas on
  * top of a real text/bold/justification decode, stated here.
  */
object DocDecode {

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  private final case class Piece(cpStart: Int, cpEnd: Int, fc: Int,
                                 bytesPerChar: Int)
  /** Half-open FC interval carrying a property value. */
  private final case class FcProp[A](fcStart: Int, fcEnd: Int, value: A)

  private final case class ParaProps(jc: Int, dxaLeft: Int,
                                     pageBreakBefore: Boolean)
  private val DefaultPara = ParaProps(0, 0, pageBreakBefore = false)

  /** Operand length of a Word sprm from its spra bits (MS-DOC 2.2.5.1);
    * spra 6 is variable (first operand byte is the size).
    */
  private def sprmLen(sprm: Int, grpprl: Array[Byte], at: Int): Int =
    (sprm >> 13) & 0x7 match {
      case 0 | 1 => 1
      case 2 | 4 | 5 => 2
      case 3 => 4
      case 7 => 3
      case 6 => 1 + (grpprl(at) & 0xFF)
    }

  private def scanSprms(grpprl: Array[Byte])(f: (Int, Array[Byte], Int) => Unit): Unit = {
    var i = 0
    while (i + 2 <= grpprl.length) {
      val sprm = u16(grpprl, i)
      i += 2
      val len = sprmLen(sprm, grpprl, i)
      if (i + len <= grpprl.length) f(sprm, grpprl, i)
      i += len
    }
  }

  def docBodyElements(bytes: Array[Byte]): Seq[BodyElement] = {
    val streams = CfbDecode.streams(bytes)
    val word = streams.getOrElse("WordDocument",
      throw new IllegalArgumentException("not a DOC: no WordDocument stream"))
    require(word.length >= 0x200 && u16(word, 0) == 0xA5EC,
      "not a DOC: bad FIB wIdent")
    val whichTbl = if ((u16(word, 0x0A) & 0x0200) != 0) "1Table" else "0Table"
    val table = streams.getOrElse(whichTbl,
      throw new IllegalArgumentException(s"not a DOC: no $whichTbl stream"))
    val ccpText = i32(word, 0x4C)
    val fcPlcfBteChpx = i32(word, 0xFA)
    val lcbPlcfBteChpx = i32(word, 0xFE)
    val fcPlcfBtePapx = i32(word, 0x102)
    val lcbPlcfBtePapx = i32(word, 0x106)
    val fcClx = i32(word, 0x1A2)
    val lcbClx = i32(word, 0x1A6)

    // ---- piece table (Clx -> Pcdt -> PlcPcd) ----
    val pieces: Seq[Piece] = {
      var off = fcClx
      val end = fcClx + lcbClx
      var result: Seq[Piece] = null
      while (result == null && off < end) {
        (table(off) & 0xFF) match {
          case 0x01 => off += 3 + u16(table, off + 1) // Prc: skip grpprl
          case 0x02 =>
            val lcb = i32(table, off + 1)
            // untrusted length: the PlcPcd must fit inside the table
            // stream, else a corrupt lcb drives an O(lcb) allocation
            // (compare in Long — off + 5 + lcb wraps negative for
            // lcb near Int.MaxValue and would pass an Int compare)
            require(lcb >= 4 && off.toLong + 5 + lcb <= table.length,
              s"PlcPcd length $lcb out of range")
            val plc = off + 5
            val n = (lcb - 4) / 12
            result = (0 until n).map { k =>
              val cpS = i32(table, plc + 4 * k)
              val cpE = i32(table, plc + 4 * (k + 1))
              val fcField = i32(table, plc + 4 * (n + 1) + 8 * k + 2)
              val compressed = (fcField & 0x40000000) != 0
              val rawFc = fcField & 0x3FFFFFFF
              Piece(cpS, cpE, if (compressed) rawFc / 2 else rawFc,
                if (compressed) 1 else 2)
            }
          case other =>
            throw new IllegalArgumentException(f"bad Clx tag 0x$other%02x")
        }
      }
      require(result != null, "no piece table in Clx")
      result
    }

    // ---- text + cp -> fc mapping ----
    // ccpText is untrusted: main-text chars cannot exceed the stream's
    // bytes (1 byte/char minimum in the cp1252 pieces)
    require(ccpText >= 0 && ccpText <= word.length,
      s"ccpText $ccpText out of range for ${word.length}-byte stream")
    val sb = new java.lang.StringBuilder(ccpText)
    for (p <- pieces) {
      val count = p.cpEnd - p.cpStart
      if (p.bytesPerChar == 1)
        sb.append(new String(word, p.fc, count, "windows-1252"))
      else
        sb.append(new String(word, p.fc, 2 * count, "UTF-16LE"))
    }
    val text = sb.substring(0, math.min(sb.length, ccpText))
    def fcOfCp(cp: Int): Int = {
      val p = pieces.find(p => cp >= p.cpStart && cp < p.cpEnd)
        .getOrElse(pieces.last)
      p.fc + (math.min(cp, p.cpEnd) - p.cpStart) * p.bytesPerChar
    }

    // ---- bin table -> FKP pages (shared walk for CHPX and PAPX) ----
    def binTable(fc: Int, lcb: Int): Seq[(Int, Int, Int)] = {
      if (lcb < 8) return Nil
      val n = (lcb - 4) / 8 // n pn entries, n+1 FCs
      (0 until n).map { i =>
        (i32(table, fc + 4 * i), i32(table, fc + 4 * (i + 1)),
          i32(table, fc + 4 * (n + 1) + 4 * i))
      }
    }

    // CHPX FKPs: rgfc + rgb offsets; rgb 0 = default properties
    val boldRuns: Seq[FcProp[Option[Boolean]]] =
      binTable(fcPlcfBteChpx, lcbPlcfBteChpx).flatMap { case (_, _, pn) =>
        val page = pn * 512
        val crun = word(page + 511) & 0xFF
        (0 until crun).map { i =>
          val fcS = i32(word, page + 4 * i)
          val fcE = i32(word, page + 4 * (i + 1))
          val rgb = word(page + 4 * (crun + 1) + i) & 0xFF
          val bold: Option[Boolean] =
            if (rgb == 0) None
            else {
              val chpx = page + rgb * 2
              val cb = word(chpx) & 0xFF
              var b: Option[Boolean] = None
              scanSprms(java.util.Arrays.copyOfRange(word, chpx + 1,
                chpx + 1 + cb)) { (sprm, g, at) =>
                if (sprm == 0x0835) b = Some((g(at) & 0xFF) == 1)
              }
              b
            }
          FcProp(fcS, fcE, bold)
        }
      }

    // PAPX FKPs: rgfc + 13-byte BX entries (first byte = papx/2)
    val paraProps: Seq[FcProp[ParaProps]] =
      binTable(fcPlcfBtePapx, lcbPlcfBtePapx).flatMap { case (_, _, pn) =>
        val page = pn * 512
        val cpara = word(page + 511) & 0xFF
        (0 until cpara).map { i =>
          val fcS = i32(word, page + 4 * i)
          val fcE = i32(word, page + 4 * (i + 1))
          val bxOff = page + 4 * (cpara + 1) + 13 * i
          val papxOff = (word(bxOff) & 0xFF) * 2
          var props = DefaultPara
          if (papxOff != 0) {
            val papx = page + papxOff
            val cb = word(papx) & 0xFF
            // PapxInFkp: cb != 0 -> (2*cb - 1) bytes of istd+grpprl
            // after the cb byte; cb == 0 -> next byte cb2, 2*cb2 bytes
            val (contentOff, contentLen) =
              if (cb != 0) (papx + 1, 2 * cb - 1)
              else (papx + 2, 2 * (word(papx + 1) & 0xFF))
            if (contentLen >= 2) {
              val grpprl = java.util.Arrays.copyOfRange(word,
                contentOff + 2, contentOff + contentLen) // skip istd
              scanSprms(grpprl) { (sprm, g, at) =>
                sprm match {
                  case 0x2403 => props = props.copy(jc = g(at) & 0xFF)
                  case 0x840F => props = props.copy(dxaLeft = u16(g, at))
                  case 0x2407 =>
                    props = props.copy(pageBreakBefore = (g(at) & 0xFF) == 1)
                  case _ =>
                }
              }
            }
          }
          FcProp(fcS, fcE, props)
        }
      }

    def lookup[A](props: Seq[FcProp[A]], fc: Int, default: A): A =
      props.find(p => fc >= p.fcStart && fc < p.fcEnd)
        .map(_.value).getOrElse(default)

    // ---- paragraphs: text split at paragraph marks (0x0D; cell marks
    // 0x07 flattened — see the object scaladoc) ----
    val out = new ArrayBuffer[BodyElement]
    var cpStart = 0
    def emit(cpS: Int, cpEndIncl: Int): Unit = {
      val paraText = text.substring(cpS, cpEndIncl) // mark stripped
        // (the reference strips the trailing \r, DocumentParser.java:117)
      val markFc = fcOfCp(cpEndIncl)
      val props = lookup(paraProps, markFc, DefaultPara)
      // runs: split the paragraph char range at CHPX boundaries
      val runs = new ArrayBuffer[Run](2)
      var c = cpS
      while (c < cpEndIncl) {
        val fc = fcOfCp(c)
        val run = boldRuns.find(r => fc >= r.fcStart && fc < r.fcEnd)
        // Long arithmetic: with no covering CHPX interval (real-world
        // docs can lack the bin table) the run end is unbounded and an
        // Int step would overflow past c
        val runEndFc: Long = run.map(_.fcEnd.toLong).getOrElse(Long.MaxValue / 4)
        val piece = pieces.find(p => c >= p.cpStart && c < p.cpEnd)
          .getOrElse(pieces.last)
        val step = math.max(1L, (runEndFc - fc) / piece.bytesPerChar)
        val cpRunEnd = math.min(cpEndIncl.toLong,
          math.min(piece.cpEnd.toLong, c + step)).toInt
        runs += Run(text.substring(c, cpRunEnd),
          bold = run.flatMap(_.value))
        c = cpRunEnd
      }
      out += ParaElement(Element(
        text = paraText,
        runs = runs.toSeq,
        align = Align.Left,
        indentRatio =
          if (props.dxaLeft > 0) props.dxaLeft / 12240f else 0f,
        canBeHeader =
          if (props.pageBreakBefore) Some(CanBeHeader.Must) else None,
        docDialect = true,
        justification = props.jc))
    }
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      if (ch == '\r' || ch == '\u0007') {
        emit(cpStart, i)
        cpStart = i + 1
      }
      i += 1
    }
    if (cpStart < text.length) emit(cpStart, text.length)
    out.toSeq
  }

  /** DOC bytes -> segmented MultiDoc (the reference's
    * `parse(bytes, DOC)` surface, `DocumentParser.java:108-209`).
    */
  def decodeDoc(bytes: Array[Byte]): MultiDoc =
    Segmenter.segment(docBodyElements(bytes))
}
