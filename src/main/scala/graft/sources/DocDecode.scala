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
  * Beyond the r04 surface this also decodes (r05):
  *
  *   - list numbering (PlfLst -> LSTF/LVLF/xst, PlfLfo -> ilfo->lsid,
  *     sprmPIlfo 0x460B / sprmPIlvl 0x260A in PAPX) — the data behind
  *     the reference's DOC list-prefix machine
  *     (`DocumentParser.java:140-179`), surfaced as
  *     [[graft.core.ListRef]] with `docLevels` set so the segmenter's
  *     DOC-variant prefix algorithm (A3) fires on real bytes;
  *   - section properties (PlcfSed -> Sepx -> sprmSXaPage 0xB01F):
  *     page width for the 25%-indent header gate
  *     (`DocumentParser.java:113,824-826`), default 12240 twips.
  *
  *   - tables (sprmPFInTable 0x2416 / sprmPFTtp 0x2417 in PAPX +
  *     0x07 cell/row marks in the text stream): reassembled into
  *     [[graft.core.TableElement]] rows -> cells -> paragraphs, the
  *     same structure POI's TableIterator hands the reference
  *     (`DocumentParser.java:111-112,745-792`), so the shared table
  *     traversal (A6: constant-column detection, bilingual probe,
  *     per-row CanBeHeader demotion) runs on real bytes.
  *
  * Documented deltas vs full HWPF: cell/TTP marks are stripped from
  * emitted text like paragraph marks (POI's raw `text()` retains the
  * 0x07s and the reference only strips a trailing 0x0D — noise chars
  * the fixture dialect never carried); LFO level overrides (LFOLVL)
  * are not applied (the reference's POI path also resolves numbering
  * through the base LSTF levels only, `DocumentParser.java:141-143`).
  *
  * All interval lookups (piece table, CHPX runs, PAPX paragraphs) are
  * binary searches over the construction-sorted arrays — a heavily
  * edited real Word97 file carries thousands of pieces/runs, and the
  * r04 per-char linear `find` made one row's decode O(pieces x runs).
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
                                     pageBreakBefore: Boolean,
                                     ilfo: Int, ilvl: Int,
                                     inTable: Boolean, ttp: Boolean)
  private val DefaultPara =
    ParaProps(0, 0, pageBreakBefore = false, 0, 0,
      inTable = false, ttp = false)

  /** Rightmost interval with fcStart <= fc that still contains fc, over
    * an array sorted by fcStart (non-overlapping by construction in
    * well-formed FKPs; on overlap the later interval wins, which any
    * containing interval satisfies for totality).
    */
  private def findInterval[A](arr: Array[FcProp[A]], fc: Int): FcProp[A] = {
    var lo = 0; var hi = arr.length - 1; var res = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid).fcStart <= fc) { res = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (res >= 0 && fc < arr(res).fcEnd) arr(res) else null
  }

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
    val fcPlcfSed = i32(word, 0xCA)
    val lcbPlcfSed = i32(word, 0xCE)
    // FibRgFcLcb97 entries 73/74 sit past the r04 0x200 floor; a short
    // (but valid-FIB) stream simply has no list tables
    val fcPlfLst = if (word.length >= 0x2F2) i32(word, 0x2E2) else 0
    val lcbPlfLst = if (word.length >= 0x2F2) i32(word, 0x2E6) else 0
    val fcPlfLfo = if (word.length >= 0x2F2) i32(word, 0x2EA) else 0
    val lcbPlfLfo = if (word.length >= 0x2F2) i32(word, 0x2EE) else 0

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
    // PlcPcd CPs are ascending by spec; sort defensively so the binary
    // search stays total on corrupt inputs
    val pieceArr: Array[Piece] = pieces.toArray.sortBy(_.cpStart)
    def pieceOf(cp: Int): Piece = {
      var lo = 0; var hi = pieceArr.length - 1; var res = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (pieceArr(mid).cpStart <= cp) { res = mid; lo = mid + 1 }
        else hi = mid - 1
      }
      if (res >= 0 && cp < pieceArr(res).cpEnd) pieceArr(res)
      else pieceArr(pieceArr.length - 1)
    }
    def fcOfCp(cp: Int): Int = {
      val p = pieceOf(cp)
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
    val boldRuns: Array[FcProp[Option[Boolean]]] =
      binTable(fcPlcfBteChpx, lcbPlcfBteChpx).iterator.flatMap { case (_, _, pn) =>
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
      }.toArray.sortBy(_.fcStart)

    // PAPX FKPs: rgfc + 13-byte BX entries (first byte = papx/2)
    val paraProps: Array[FcProp[ParaProps]] =
      binTable(fcPlcfBtePapx, lcbPlcfBtePapx).iterator.flatMap { case (_, _, pn) =>
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
                  case 0x460B => props = props.copy(ilfo = u16(g, at))
                  case 0x260A => props = props.copy(ilvl = g(at) & 0xFF)
                  case 0x2416 => // sprmPFInTable
                    props = props.copy(inTable = (g(at) & 0xFF) == 1)
                  case 0x2417 => // sprmPFTtp (row-terminator paragraph)
                    props = props.copy(ttp = (g(at) & 0xFF) == 1)
                  case _ =>
                }
              }
            }
          }
          FcProp(fcS, fcE, props)
        }
      }.toArray.sortBy(_.fcStart)

    def lookup[A](props: Array[FcProp[A]], fc: Int, default: A): A = {
      val p = findInterval(props, fc)
      if (p == null) default else p.value
    }

    // ---- section properties: PlcfSed -> Sepx -> sprmSXaPage ----
    // (DocumentParser.java:113 — page width for the indent header gate)
    val pageWidth: Int = {
      var xaPage = 12240 // POI SectionProperties default
      val nSed = (lcbPlcfSed - 4) / 16
      if (nSed > 0 && fcPlcfSed >= 0 &&
          fcPlcfSed.toLong + lcbPlcfSed <= table.length) {
        val fcSepx = i32(table, fcPlcfSed + 4 * (nSed + 1) + 2)
        if (fcSepx >= 0 && fcSepx.toLong + 2 <= word.length) {
          val cb = u16(word, fcSepx)
          if (fcSepx.toLong + 2 + cb <= word.length) {
            scanSprms(java.util.Arrays.copyOfRange(word, fcSepx + 2,
              fcSepx + 2 + cb)) { (sprm, g, at) =>
              if (sprm == 0xB01F) xaPage = u16(g, at)
            }
          }
        }
      }
      if (xaPage > 0) xaPage else 12240
    }

    // ---- list tables: PlfLst (lsid -> levels) + PlfLfo (ilfo -> lsid) ----
    val listLevels: Map[Int, IndexedSeq[DocLevel]] = {
      if (lcbPlfLst < 2 || fcPlfLst < 0 ||
          fcPlfLst.toLong + lcbPlfLst > table.length) Map.empty
      else {
        val end = fcPlfLst + lcbPlfLst
        val cLst = u16(table, fcPlfLst)
        // LSTF array first (28 bytes each), LVL structures after it —
        // every read is bounds-gated so a corrupt count throws (error
        // row) instead of scanning off the table stream
        require(fcPlfLst + 2 + 28L * cLst <= table.length,
          s"PlfLst LSTF array ($cLst lists) out of range")
        val lstfs = (0 until cLst).map { k =>
          val at = fcPlfLst + 2 + 28 * k
          (i32(table, at), (table(at + 26) & 0x01) != 0) // (lsid, fSimple)
        }
        var cur = fcPlfLst + 2 + 28 * cLst
        val out = Map.newBuilder[Int, IndexedSeq[DocLevel]]
        for ((lsid, fSimple) <- lstfs) {
          val nLvl = if (fSimple) 1 else 9
          val levels = (0 until nLvl).map { _ =>
            require(cur + 28 <= end, "LVLF out of PlfLst range")
            val iStartAt = i32(table, cur)
            val nfc = table(cur + 4) & 0xFF
            val cbChpx = table(cur + 24) & 0xFF
            val cbPapx = table(cur + 25) & 0xFF
            cur += 28 + cbPapx + cbChpx // LVLF, grpprlPapx, grpprlChpx
            require(cur + 2 <= end, "LVL xst out of PlfLst range")
            val cch = u16(table, cur)
            require(cur + 2 + 2L * cch <= end, "LVL xst text out of range")
            val xst = new String(table, cur + 2, 2 * cch, "UTF-16LE")
            cur += 2 + 2 * cch
            DocLevel(iStartAt, nfc, xst)
          }
          out += lsid -> levels
        }
        out.result()
      }
    }
    val lfoLsids: IndexedSeq[Int] = {
      if (lcbPlfLfo < 4 || fcPlfLfo < 0 ||
          fcPlfLfo.toLong + lcbPlfLfo > table.length) IndexedSeq.empty
      else {
        val lfoMac = i32(table, fcPlfLfo)
        if (lfoMac <= 0 || 4 + 16L * lfoMac > lcbPlfLfo) IndexedSeq.empty
        else (0 until lfoMac).map(k => i32(table, fcPlfLfo + 4 + 16 * k))
        // trailing LFOLVL overrides not applied (object scaladoc)
      }
    }
    def listRefOf(props: ParaProps): Option[ListRef] =
      if (props.ilfo <= 0 || props.ilfo > lfoLsids.length) None
      else {
        val lsid = lfoLsids(props.ilfo - 1)
        listLevels.get(lsid).map { levels =>
          val ilvl = math.min(math.max(props.ilvl, 0), levels.length - 1)
          ListRef(lsid, ilvl,
            if (levels(ilvl).nfc == 23) "bullet" else "decimal",
            template = "", startAt = levels(ilvl).startAt,
            docLevels = levels)
        }
      }

    // ---- paragraphs: text split at paragraph marks (0x0D) and cell/
    // row marks (0x07). Word97 table structure is reassembled from the
    // PAPX table flags exactly as POI's TableIterator walks it
    // (fInTable marks table paragraphs, fTtp marks the row-terminator
    // paragraph): cell-mark-terminated paragraphs close a cell, the TTP
    // closes the row, and a non-table paragraph flushes the pending
    // rows as one [[TableElement]] — so the shared table traversal
    // (constant-column detection, bilingual probe, per-row CanBeHeader
    // demotion) runs on REAL .doc bytes. Marks are stripped from
    // paragraph text and the TTP contributes no text, matching the
    // markup-dialect contract (POI's raw text() would retain the 0x07
    // chars the reference only strips for 0x0D — a noise-char delta
    // the fixture dialect already pinned). Word97 predates nested
    // tables, so fInTable/fTtp is the complete table surface here.
    val out = new ArrayBuffer[BodyElement]
    val tblRows = new ArrayBuffer[Seq[Seq[BodyElement]]]
    val tblCells = new ArrayBuffer[Seq[BodyElement]]
    val tblCell = new ArrayBuffer[BodyElement]
    def closeRow(): Unit = {
      if (tblCell.nonEmpty) { tblCells += tblCell.toSeq; tblCell.clear() }
      if (tblCells.nonEmpty) { tblRows += tblCells.toSeq; tblCells.clear() }
    }
    def flushTable(): Unit = {
      closeRow()
      if (tblRows.nonEmpty) { out += TableElement(tblRows.toSeq); tblRows.clear() }
    }
    var cpStart = 0
    def emit(cpS: Int, cpEndIncl: Int, mark: Char): Unit = {
      val paraText = text.substring(cpS, cpEndIncl) // mark stripped
        // (the reference strips the trailing \r, DocumentParser.java:117)
      val markFc = fcOfCp(cpEndIncl)
      val props = lookup(paraProps, markFc, DefaultPara)
      // runs: split the paragraph char range at CHPX boundaries
      val runs = new ArrayBuffer[Run](2)
      var c = cpS
      while (c < cpEndIncl) {
        val fc = fcOfCp(c)
        val run = findInterval(boldRuns, fc)
        // Long arithmetic: with no covering CHPX interval (real-world
        // docs can lack the bin table) the run end is unbounded and an
        // Int step would overflow past c
        val runEndFc: Long =
          if (run == null) Long.MaxValue / 4 else run.fcEnd.toLong
        val piece = pieceOf(c)
        val step = math.max(1L, (runEndFc - fc) / piece.bytesPerChar)
        // outer max: the fallback piece of a gapped (corrupt) piece
        // table can have cpEnd <= c — force progress so the loop is total
        val cpRunEnd = math.max(c + 1L, math.min(cpEndIncl.toLong,
          math.min(piece.cpEnd.toLong, c + step))).toInt
        runs += Run(text.substring(c, cpRunEnd),
          bold = if (run == null) None else run.value)
        c = cpRunEnd
      }
      val el = Element(
        text = paraText,
        runs = runs.toSeq,
        align = Align.Left,
        indentRatio =
          if (props.dxaLeft > 0) props.dxaLeft.toFloat / pageWidth else 0f,
        canBeHeader =
          if (props.pageBreakBefore) Some(CanBeHeader.Must) else None,
        listRef = listRefOf(props),
        docDialect = true,
        justification = props.jc)
      if (props.inTable) {
        if (props.ttp) closeRow() // row terminator; its text (just the
          // 0x07 mark in well-formed files) carries no content
        else {
          tblCell += ParaElement(el)
          if (mark == '\u0007') { // cell mark closes the cell
            tblCells += tblCell.toSeq; tblCell.clear()
          }
        }
      } else {
        flushTable()
        out += ParaElement(el)
      }
    }
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      if (ch == '\r' || ch == '\u0007') {
        emit(cpStart, i, ch)
        cpStart = i + 1
      }
      i += 1
    }
    // unterminated tail: treat the missing mark as a paragraph mark;
    // an in-table tail joins its open cell and flushTable closes it
    if (cpStart < text.length) emit(cpStart, text.length, '\r')
    flushTable()
    out.toSeq
  }

  /** DOC bytes -> segmented MultiDoc (the reference's
    * `parse(bytes, DOC)` surface, `DocumentParser.java:108-209`).
    */
  def decodeDoc(bytes: Array[Byte]): MultiDoc =
    Segmenter.segment(docBodyElements(bytes))
}
