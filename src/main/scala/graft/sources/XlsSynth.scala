package graft.sources

import java.io.ByteArrayOutputStream

/** Deterministic XLS (BIFF8) synthesizer: real CFB containers holding a
  * real Workbook stream (globals: BOF + SST + BoundSheet8 + EOF; one
  * worksheet substream per sheet: BOF + LabelSst cells + EOF) — for the
  * q63 decode oracle and XlsDecodeSpec. Byte-stable (no timestamps in
  * BIFF or CFB), same discipline as [[OoxmlSynth]]/[[DocSynth]]. All
  * cell values ride the SST as STRING cells (the only type the
  * reference's beneficiary scan consumes, `ExcelParser.java:160`);
  * strings are written UTF-16 when any char exceeds Latin-1.
  */
object XlsSynth {

  private def u16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def i32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def rec(sid: Int, payload: Array[Byte]): Array[Byte] =
    u16(sid) ++ u16(payload.length) ++ payload

  private def bof(dt: Int): Array[Byte] =
    rec(0x0809, u16(0x0600) ++ u16(dt) ++ u16(0x0DBB) ++ u16(0x07CC) ++
      i32(0) ++ i32(0x0006))

  /** Typed synth cell: STRING via the SST, or an RK-encoded numeric —
    * runs of >= 2 consecutive RkCells in a row are written as ONE MulRk
    * record (the form real-world BIFF8 writers emit for numeric rows),
    * single ones as RK.
    */
  sealed trait XCell
  final case class SCell(s: String) extends XCell
  final case class RkCell(v: Double) extends XCell

  /** A formula cell with a cached STRING result: a Formula record
    * (MS-XLS 2.4.127, string-sentinel FormulaValue) directly followed
    * by a String record (2.4.268) carrying the cached text — the
    * layout every real-world sheet with text formulas has. `formula`
    * is written as an opaque rgce placeholder blob (the decoder skips
    * it by cce; only POI's CellType.FORMULA surface matters here).
    */
  final case class FCell(formula: String, cached: String) extends XCell

  /** [[FCell]] with a ShrFmla record (MS-XLS 2.4.269) interposed
    * between the Formula and its String record — the shared-formula
    * layout Excel emits for fill-down ranges (an Array 0x0221 or Table
    * 0x0236 can sit there too; ADVICE r05). The cached text must
    * survive the interposition.
    */
  final case class FCellShared(formula: String, cached: String) extends XCell

  /** An inline-string Label cell (MS-XLS 2.4.148) — the pre-SST layout
    * old converters still emit inside BIFF8 files; POI surfaces it as
    * a STRING cell exactly like LabelSst.
    */
  final case class LCell(s: String) extends XCell

  /** RK encoding of a double (MS-XLS 2.5.276): prefer the 30-bit
    * integer form, then integer-x100 (fDiv100), then the truncated-
    * double form (exact only when the low 34 mantissa bits are zero);
    * values that round-trip under none of them are a synth spec error.
    */
  private def rkBits(v: Double): Int = {
    val asLong = v.toLong
    if (asLong.toDouble == v && math.abs(asLong) < (1L << 29))
      ((asLong.toInt << 2) | 2)
    else {
      val c = math.rint(v * 100)
      if (math.abs(c) < (1L << 29) && c / 100.0 == v)
        ((c.toInt << 2) | 3)
      else {
        val bits = java.lang.Double.doubleToLongBits(v)
        require((bits & 0x3FFFFFFFFL) == 0, s"$v is not RK-encodable")
        ((bits >>> 32) & 0xFFFFFFFCL).toInt
      }
    }
  }

  /** SST record + any Continue records (MS-XLS 2.1.4): string blobs are
    * packed into records of at most `cap` payload bytes; a string whose
    * character data crosses a record boundary continues in the next
    * record behind a fresh fHighByte option byte (the split always
    * lands on a character boundary, and the header never straddles) —
    * exactly how Excel spills an SST past 8224 bytes.
    */
  private[sources] def sstBlock(total: Int, unique: Seq[String],
                                cap: Int = 8224): Array[Byte] = {
    val segs = new scala.collection.mutable.ArrayBuffer[ByteArrayOutputStream]
    var cur = new ByteArrayOutputStream()
    cur.write(i32(total)); cur.write(i32(unique.length))
    def room: Int = cap - cur.size
    def newSeg(): Unit = { segs += cur; cur = new ByteArrayOutputStream() }
    for (s <- unique) {
      val high = s.exists(_ > 0xFF)
      val width = if (high) 2 else 1
      // keep the 3-byte header and the first character together
      if (room < 3 + width) newSeg()
      cur.write(u16(s.length)); cur.write(if (high) 1 else 0)
      var idx = 0
      while (idx < s.length) {
        if (room < width) { newSeg(); cur.write(if (high) 1 else 0) }
        val take = math.min(s.length - idx, room / width)
        val chunk = s.substring(idx, idx + take)
        cur.write(
          if (high) chunk.getBytes("UTF-16LE") else chunk.getBytes("ISO-8859-1"))
        idx += take
      }
    }
    newSeg()
    val out = new ByteArrayOutputStream()
    out.write(rec(0x00FC, segs.head.toByteArray))
    for (k <- 1 until segs.length) out.write(rec(0x003C, segs(k).toByteArray))
    out.toByteArray
  }

  /** Build an .xls: `sheets` = name -> rows -> STRING cells. */
  def xls(sheets: Seq[(String, Seq[Seq[String]])]): Array[Byte] =
    xlsTyped(sheets.map { case (n, rows) => n -> rows.map(_.map(SCell)) })

  /** Build an .xls from typed cells (STRING + RK/MulRk numerics).
    * `sstCap` caps SST record payloads (default = the real 8224-byte
    * BIFF limit); a small cap forces Continue-record spills so tests
    * and the q63 corpus exercise split strings without megabytes of
    * text.
    */
  /** Formula (string-sentinel FormulaValue) + cached String record;
    * `shared = true` interposes a ShrFmla record between them (the
    * fill-down layout, MS-XLS 2.4.268/2.4.269).
    */
  private def writeFormula(out: ByteArrayOutputStream, rw: Int, colIdx: Int,
                           formula: String, cached: String,
                           shared: Boolean): Unit = {
    val rgce = formula.getBytes("ISO-8859-1")
    out.write(rec(0x0006,
      u16(rw) ++ u16(colIdx) ++ u16(0x000F) ++
        Array[Byte](0, 0, 0, 0, 0, 0, -1, -1) ++ // string sentinel
        u16(0) ++ i32(0) ++ u16(rgce.length) ++ rgce))
    if (shared)
      // ShrFmla: ref (rwFirst, rwLast, colFirst, colLast), reserved,
      // cUse, cce = 0 (empty shared rgce — the decoder skips by sid)
      out.write(rec(0x04BC,
        u16(rw) ++ u16(rw) ++ Array[Byte](colIdx.toByte, colIdx.toByte,
          0, 1) ++ u16(0)))
    val high = cached.exists(_ > 0xFF)
    out.write(rec(0x0207,
      u16(cached.length) ++
        Array[Byte](if (high) 1 else 0) ++
        (if (high) cached.getBytes("UTF-16LE")
         else cached.getBytes("ISO-8859-1"))))
  }

  def xlsTyped(sheets: Seq[(String, Seq[Seq[XCell]])],
               sstCap: Int = 8224): Array[Byte] = {
    val allStrings = sheets.flatMap(_._2.flatten).collect { case SCell(s) => s }
    val unique = allStrings.distinct
    val sstIndex = unique.zipWithIndex.toMap

    // worksheet substreams (positions patched into BoundSheet8 below)
    val sheetBytes = sheets.map { case (_, rows) =>
      val out = new ByteArrayOutputStream()
      out.write(bof(0x0010))
      for ((cells, rw) <- rows.zipWithIndex) {
        var colIdx = 0
        while (colIdx < cells.length) {
          cells(colIdx) match {
            case SCell(v) =>
              out.write(rec(0x00FD,
                u16(rw) ++ u16(colIdx) ++ u16(0x000F) ++ i32(sstIndex(v))))
              colIdx += 1
            case LCell(v) =>
              val high = v.exists(_ > 0xFF)
              out.write(rec(0x0204,
                u16(rw) ++ u16(colIdx) ++ u16(0x000F) ++ u16(v.length) ++
                  Array[Byte](if (high) 1 else 0) ++
                  (if (high) v.getBytes("UTF-16LE")
                   else v.getBytes("ISO-8859-1"))))
              colIdx += 1
            case FCell(formula, cached) =>
              writeFormula(out, rw, colIdx, formula, cached, shared = false)
              colIdx += 1
            case FCellShared(formula, cached) =>
              writeFormula(out, rw, colIdx, formula, cached, shared = true)
              colIdx += 1
            case RkCell(_) =>
              var end = colIdx
              while (end < cells.length && cells(end).isInstanceOf[RkCell])
                end += 1
              if (end - colIdx == 1) {
                val RkCell(v) = cells(colIdx): @unchecked
                out.write(rec(0x027E,
                  u16(rw) ++ u16(colIdx) ++ u16(0x000F) ++ i32(rkBits(v))))
              } else {
                val body = new ByteArrayOutputStream()
                body.write(u16(rw)); body.write(u16(colIdx))
                for (k <- colIdx until end) {
                  val RkCell(v) = cells(k): @unchecked
                  body.write(u16(0x000F)); body.write(i32(rkBits(v)))
                }
                body.write(u16(end - 1)) // colLast
                out.write(rec(0x00BD, body.toByteArray))
              }
              colIdx = end
          }
        }
      }
      out.write(rec(0x000A, Array.emptyByteArray))
      out.toByteArray
    }

    // globals: BOF + SST(+Continues) + BoundSheet8 per sheet + EOF;
    // record lengths depend only on strings/names, so positions resolve
    // in one pass
    val sst = sstBlock(allStrings.length, unique, sstCap)
    def boundSheet(name: String, pos: Int): Array[Byte] = {
      val high = name.exists(_ > 0xFF)
      rec(0x0085, i32(pos) ++ u16(0x0000) ++
        Array(name.length.toByte, (if (high) 1 else 0).toByte) ++
        (if (high) name.getBytes("UTF-16LE") else name.getBytes("ISO-8859-1")))
    }
    val globalsLen = bof(0).length + sst.length +
      sheets.map(s => boundSheet(s._1, 0).length).sum + 4
    val positions = sheetBytes.scanLeft(globalsLen)(_ + _.length).init
    val out = new ByteArrayOutputStream()
    out.write(bof(0x0005))
    out.write(sst)
    for ((s, pos) <- sheets.zip(positions)) out.write(boundSheet(s._1, pos))
    out.write(rec(0x000A, Array.emptyByteArray))
    require(out.size == globalsLen, s"globals length ${out.size} != $globalsLen")
    sheetBytes.foreach(out.write)
    DocSynth.cfb(Seq("Workbook" -> out.toByteArray))
  }
}
