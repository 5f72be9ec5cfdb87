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
  * Documented deltas vs full HSSF: formula results, continued SST
  * records (strings split across Continue records) and number
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

  /** XLUnicodeRichExtendedString at `off`: (string, bytesConsumed). */
  private def xlString(b: Array[Byte], off: Int): (String, Int) = {
    val cch = u16(b, off)
    val flags = b(off + 2) & 0xFF
    val highByte = (flags & 0x01) != 0
    val extSt = (flags & 0x04) != 0
    val richSt = (flags & 0x08) != 0
    var p = off + 3
    val cRun = if (richSt) { val v = u16(b, p); p += 2; v } else 0
    val cbExt = if (extSt) { val v = i32(b, p); p += 4; v } else 0
    val s =
      if (highByte) { val v = new String(b, p, 2 * cch, "UTF-16LE"); p += 2 * cch; v }
      else { val v = new String(b, p, cch, "ISO-8859-1"); p += cch; v }
    p += 4 * cRun + cbExt // skip formatting runs + ext data
    (s, p - off)
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
    val it = records(wb, 0)
    var done = false
    while (it.hasNext && !done) {
      val r = it.next()
      r.sid match {
        case 0x00FC => // SST: cstTotal, cstUnique, then the strings
          val unique = i32(wb, r.off + 4)
          var p = r.off + 8
          var i = 0
          while (i < unique && p < r.off + r.len) {
            val (s, consumed) = xlString(wb, p)
            // corrupt rich/ext length fields can yield a non-advancing
            // cursor; unique is itself untrusted, so refuse to spin
            require(consumed > 0, s"non-advancing SST string at $p")
            sst += s
            p += consumed
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
      val sit = records(wb, pos)
      var end = false
      while (sit.hasNext && !end) {
        val r = sit.next()
        r.sid match {
          case 0x00FD => // LabelSst
            val rw = u16(wb, r.off); val colIdx = u16(wb, r.off + 2)
            val isst = i32(wb, r.off + 6)
            cells += ((rw, colIdx, "STRING",
              if (isst >= 0 && isst < sst.length) sst(isst) else ""))
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
