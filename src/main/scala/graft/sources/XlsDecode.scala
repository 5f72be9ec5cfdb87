package graft.sources

import graft.core.SheetTable
import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Real XLS (BIFF8 / Excel 97 binary) decode with JDK-only parts — the
  * format the reference opens through POI's HSSF
  * (`ExcelParser.java:63`, `new HSSFWorkbook(inputStream)`). Built on
  * [[CfbDecode]] for the OLE2 container; this file reads the published
  * BIFF8 record structures the beneficiary path needs:
  *
  *   - the workbook globals substream: SST (shared strings, compressed
  *     8-bit and UTF-16 forms, rich/ext headers skipped per spec) and
  *     BoundSheet8 (sheet names + substream positions);
  *   - per-sheet substreams: LabelSst (STRING cells), Number (NUMERIC),
  *     RK and MulRk (the compressed NUMERIC forms most real-world BIFF8
  *     writers emit — 30-bit int, int-x0.01, and truncated-double
  *     encodings, MS-XLS 2.5.276), BoolErr (BOOLEAN/ERROR), Blank —
  *     mapped to the same POI CellType names [[graft.core.SheetTable]]
  *     consumes (E1/E2/X2).
  *
  * The SST reads across Continue records (MS-XLS 2.1.4) — the layout
  * every workbook past 8224 bytes of shared strings has, including
  * strings whose character data splits mid-string with a fresh
  * encoding byte per continuation.
  *
  * Documented deltas vs full HSSF: formula results and number
  * formatting are not decoded — NUMERIC cells carry the raw IEEE
  * double's toString. Only STRING cells participate in the reference's
  * beneficiary extraction (`ExcelParser.java:160`), so the extraction
  * surface is complete.
  */
object XlsDecode {

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
  private def f64(b: Array[Byte], off: Int): Double =
    ByteBuffer.wrap(b, off, 8).order(ByteOrder.LITTLE_ENDIAN).getDouble

  private final case class Rec(sid: Int, off: Int, len: Int)

  /** RK number decode (MS-XLS 2.5.276): bit 0 = fDiv100, bit 1 = fInt;
    * the remaining 30 bits are a signed int (fInt) or the high 30 bits
    * of an IEEE double (low 34 zero).
    */
  private def rkValue(rk: Int): Double = {
    val base =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if ((rk & 0x01) != 0) base / 100.0 else base
  }

  private def records(wb: Array[Byte], from: Int): Iterator[Rec] =
    new Iterator[Rec] {
      private var pos = from
      def hasNext: Boolean = pos + 4 <= wb.length
      def next(): Rec = {
        val sid = u16(wb, pos)
        val len = u16(wb, pos + 2)
        val r = Rec(sid, pos + 4, len)
        pos += 4 + len
        r
      }
    }

  /** Cursor over an SST record body plus its Continue-record bodies
    * (MS-XLS 2.1.4 / 2.5.293): fixed fields and rich/ext skips jump
    * segment boundaries transparently (no leading byte on non-character
    * continuations), while character data re-reads a fresh fHighByte
    * option byte at each continuation — a string may switch between
    * compressed and UTF-16 encodings mid-string at a record boundary.
    * All reads are bounds-guarded: corrupt counts throw (-> error row)
    * instead of spinning or over-reading.
    */
  private final class RecSpan(wb: Array[Byte], segs: IndexedSeq[(Int, Int)]) {
    private var si = 0
    private var p = segs(0)._1
    private def segEnd: Int = segs(si)._2
    private def jumpIfEnd(): Unit =
      while (p >= segEnd && si + 1 < segs.length) { si += 1; p = segs(si)._1 }
    def u8(): Int = {
      jumpIfEnd()
      require(p < segEnd, "SST read past final Continue record")
      val v = wb(p) & 0xFF; p += 1; v
    }
    def u16(): Int = u8() | (u8() << 8)
    def i32(): Int = u16() | (u16() << 16)
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        jumpIfEnd()
        val take = math.min(left, (segEnd - p).toLong)
        require(take > 0, "SST skip past final Continue record")
        p += take.toInt; left -= take
      }
    }
    /** cch characters starting under `highInit` encoding. */
    def chars(cch: Int, highInit: Boolean): String = {
      val sb = new StringBuilder
      var high = highInit
      var left = cch
      while (left > 0) {
        if (p >= segEnd) {
          require(si + 1 < segs.length,
            "SST string runs past the final Continue record")
          si += 1; p = segs(si)._1
          high = (u8() & 0x01) != 0 // continuation option byte
        } else {
          val width = if (high) 2 else 1
          val avail = (segEnd - p) / width
          if (avail == 0) {
            // width 2 with a single trailing byte: the spec requires
            // character-boundary splits, so this is corrupt input
            require(segEnd - p == 0, "split inside a UTF-16 code unit")
          } else {
            val take = math.min(left, avail)
            sb.append(new String(wb, p, take * width,
              if (high) "UTF-16LE" else "ISO-8859-1"))
            p += take * width
            left -= take
          }
        }
      }
      sb.toString
    }
  }

  /** One XLUnicodeRichExtendedString through the span cursor. */
  private def spanString(span: RecSpan): String = {
    val cch = span.u16()
    val flags = span.u8()
    val high = (flags & 0x01) != 0
    val extSt = (flags & 0x04) != 0
    val richSt = (flags & 0x08) != 0
    val cRun = if (richSt) span.u16() else 0
    val cbExt = if (extSt) span.i32() else 0
    val s = span.chars(cch, high)
    span.skip(4L * cRun + (cbExt.toLong & 0xFFFFFFFFL))
    s
  }

  /** XLS bytes -> sheets in BoundSheet order — the exact input of
    * [[SheetTable.parseBeneficiaries]] / [[SheetTable.parseDateFromSheetName]],
    * i.e. the reference's `parseBeneficiaryWorkbook(HSSFWorkbook)` scan
    * (E1/E2/X2) on real binary workbooks.
    */
  def decodeXls(bytes: Array[Byte]): Seq[SheetTable.Sheet] = {
    val streams = CfbDecode.streams(bytes)
    val wb = streams.getOrElse("Workbook", streams.getOrElse("Book",
      throw new IllegalArgumentException("not an XLS: no Workbook stream")))

    // globals: SST + BoundSheet8 until the first EOF
    val sst = new ArrayBuffer[String]()
    val sheets = new ArrayBuffer[(String, Int)]() // (name, substream pos)
    val it = records(wb, 0).buffered
    var done = false
    while (it.hasNext && !done) {
      val r = it.next()
      r.sid match {
        case 0x00FC => // SST: cstTotal, cstUnique, then the strings,
          // spilling into any number of directly-following Continue
          // records (0x003C) — the layout every SST past 8224 bytes has
          val segs = ArrayBuffer((r.off + 8, r.off + r.len))
          while (it.hasNext && it.head.sid == 0x003C) {
            val c = it.next()
            segs += ((c.off, c.off + c.len))
          }
          val unique = i32(wb, r.off + 4)
          // `unique` is untrusted: the span cursor's bounds guards turn
          // an over-claimed count into a decode error, never a spin
          val span = new RecSpan(wb, segs.toIndexedSeq)
          var i = 0
          while (i < unique) {
            sst += spanString(span)
            i += 1
          }
        case 0x0085 => // BoundSheet8: lbPlyPos, hsState, dt, cch, flags, name
          val pos = i32(wb, r.off)
          val cch = wb(r.off + 6) & 0xFF
          val high = (wb(r.off + 7) & 0x01) != 0
          val name =
            if (high) new String(wb, r.off + 8, 2 * cch, "UTF-16LE")
            else new String(wb, r.off + 8, cch, "ISO-8859-1")
          sheets += name -> pos
        case 0x000A => done = true // EOF of the globals substream
        case _ =>
      }
    }

    sheets.toSeq.map { case (name, pos) =>
      val cells = new ArrayBuffer[(Int, Int, String, String)]() // rw, col, type, value
      val sit = records(wb, pos).buffered
      var end = false
      while (sit.hasNext && !end) {
        val r = sit.next()
        r.sid match {
          case 0x00FD => // LabelSst
            val rw = u16(wb, r.off); val colIdx = u16(wb, r.off + 2)
            val isst = i32(wb, r.off + 6)
            cells += ((rw, colIdx, "STRING",
              if (isst >= 0 && isst < sst.length) sst(isst) else ""))
          case 0x0204 => // Label (MS-XLS 2.4.148): the inline-string
            // cell pre-SST converters still emit inside BIFF8 files —
            // POI surfaces it as a STRING cell exactly like LabelSst
            val rw = u16(wb, r.off); val colIdx = u16(wb, r.off + 2)
            val cch = u16(wb, r.off + 6)
            val high = (wb(r.off + 8) & 0x01) != 0
            cells += ((rw, colIdx, "STRING",
              new RecSpan(wb, IndexedSeq((r.off + 9, r.off + r.len)))
                .chars(cch, high)))
          case 0x0203 => // Number
            val rw = u16(wb, r.off); val colIdx = u16(wb, r.off + 2)
            cells += ((rw, colIdx, "NUMERIC", f64(wb, r.off + 6).toString))
          case 0x027E => // RK
            val rw = u16(wb, r.off); val colIdx = u16(wb, r.off + 2)
            cells += ((rw, colIdx, "NUMERIC",
              rkValue(i32(wb, r.off + 6)).toString))
          case 0x00BD => // MulRk: rw, colFirst, n x (ixfe + RK), colLast
            val rw = u16(wb, r.off); val colFirst = u16(wb, r.off + 2)
            val n = (r.len - 6) / 6
            for (k <- 0 until n)
              cells += ((rw, colFirst + k, "NUMERIC",
                rkValue(i32(wb, r.off + 4 + 6 * k + 2)).toString))
          case 0x0205 => // BoolErr
            val rw = u16(wb, r.off); val colIdx = u16(wb, r.off + 2)
            val v = wb(r.off + 6) & 0xFF
            val isErr = (wb(r.off + 7) & 0xFF) == 1
            cells += ((rw, colIdx,
              if (isErr) "ERROR" else "BOOLEAN",
              if (isErr) v.toString else (v == 1).toString.toUpperCase))
          case 0x0006 => // Formula (MS-XLS 2.4.127): POI surfaces these
            // as CellType.FORMULA regardless of the cached result type,
            // and the reference's STRING-only scan (ExcelParser.java:160)
            // therefore SKIPS them — so must we, or a formula whose
            // cached string looks like a beneficiary name would leak
            // into E1/E2. The cached value is still decoded for the
            // sheet model: FormulaValue (2.5.133) is an IEEE double
            // unless its last two bytes are 0xFFFF, in which case
            // byte 0 discriminates string (text in the directly-
            // following String record, 2.4.268) / bool / error / blank.
            val rw = u16(wb, r.off); val colIdx = u16(wb, r.off + 2)
            val value =
              if ((wb(r.off + 12) & 0xFF) == 0xFF &&
                  (wb(r.off + 13) & 0xFF) == 0xFF) {
                (wb(r.off + 6) & 0xFF) match {
                  case 0 =>
                    // an Array (0x0221), ShrFmla (0x04BC) or Table
                    // (0x0236) record may sit between the Formula and
                    // its String record (MS-XLS 2.4.268; ADVICE r05) —
                    // skip them so the cached text is not lost
                    while (sit.hasNext && (sit.head.sid == 0x0221 ||
                        sit.head.sid == 0x04BC || sit.head.sid == 0x0236))
                      sit.next()
                    if (sit.hasNext && sit.head.sid == 0x0207) {
                      val s = sit.next() // String: XLUnicodeString body
                      val cch = u16(wb, s.off)
                      val high = (wb(s.off + 2) & 0x01) != 0
                      new RecSpan(wb, IndexedSeq((s.off + 3, s.off + s.len)))
                        .chars(cch, high)
                    } else ""
                  case 1 => ((wb(r.off + 8) & 0xFF) == 1).toString.toUpperCase
                  case 2 => (wb(r.off + 8) & 0xFF).toString
                  case _ => ""
                }
              } else f64(wb, r.off + 6).toString
            cells += ((rw, colIdx, "FORMULA", value))
          case 0x0201 => // Blank
            val rw = u16(wb, r.off); val colIdx = u16(wb, r.off + 2)
            cells += ((rw, colIdx, "BLANK", ""))
          case 0x000A => end = true
          case _ =>
        }
      }
      val rows = cells.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, cs) =>
        SheetTable.Row(cs.sortBy(_._2).map(c =>
          SheetTable.Cell(c._2, c._3, c._4)).toSeq)
      }
      SheetTable.Sheet(name, rows)
    }
  }
}
