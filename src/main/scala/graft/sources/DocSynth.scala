package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Deterministic MS-DOC (Word 97 binary) synthesizer — builds real CFB
  * containers holding real WordDocument/1Table streams for the q62
  * decode oracle and DocDecodeSpec. Byte-stable by construction (no
  * timestamps anywhere in CFB or FIB), so the same spec yields the same
  * bytes on every run — the oracle requirement, same as [[OoxmlSynth]].
  *
  * Layout kept deliberately canonical-simple: one ANSI (cp1252) text
  * piece, one CHPX FKP (per-paragraph explicit bold via sprmCFBold),
  * one PAPX FKP (sprmPJc / sprmPDxaLeft / sprmPPageBreakBefore), all
  * streams FAT-chained (padded to the 4096-byte mini cutoff so no mini
  * stream is needed — trailing zeros are dead bytes to a
  * pointer-addressed Word stream).
  */
object DocSynth {

  /** One paragraph: whole-paragraph bold (one CHPX run), justification
    * (0 left / 1 center / 2 right), left indent in twips, page break.
    */
  final case class DocP(text: String, bold: Boolean = false, jc: Int = 0,
                        dxaLeft: Int = 0, pageBreakBefore: Boolean = false)

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
  }
  private def putI32(b: Array[Byte], off: Int, v: Int): Unit =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).putInt(v)
  private def putI64(b: Array[Byte], off: Int, v: Long): Unit =
    ByteBuffer.wrap(b, off, 8).order(ByteOrder.LITTLE_ENDIAN).putLong(v)

  private def pad(b: Array[Byte], to: Int): Array[Byte] =
    java.util.Arrays.copyOf(b, math.max(to, ((b.length + 511) / 512) * 512))

  /** Build a .doc from paragraph specs. `unicode = true` stores the
    * text piece as UTF-16LE (fCompressed = 0 — required for non-cp1252
    * content); default is the compressed cp1252 piece Word writes for
    * Latin text.
    */
  def doc(paras: Seq[DocP], unicode: Boolean = false): Array[Byte] = {
    val textStr = paras.map(_.text).mkString("", "\r", "\r")
    val bytesPerChar = if (unicode) 2 else 1
    val textBytes =
      if (unicode) textStr.getBytes("UTF-16LE")
      else textStr.getBytes("windows-1252")
    require(unicode || new String(textBytes, "windows-1252") == textStr,
      "non-cp1252 text needs unicode = true (unmappable chars become '?')")
    val fcText = 1024
    val fcTextEnd = fcText + textBytes.length
    def fcOf(cp: Int): Int = fcText + cp * bytesPerChar

    // paragraph cp ranges incl. their marks
    val bounds = paras.foldLeft(Seq(0)) { (acc, p) =>
      acc :+ (acc.last + p.text.length + 1)
    }

    // ---- CHPX FKP (one run per paragraph incl. its mark) ----
    val chpxPage = new Array[Byte](512)
    locally {
      val crun = paras.size
      require(crun <= 20, "synth FKP capacity")
      for (i <- 0 to crun) putI32(chpxPage, 4 * i, fcOf(bounds(i)))
      var blobOff = 504
      for (i <- 0 until crun) {
        val rgbAt = 4 * (crun + 1) + i
        if (paras(i).bold) {
          // CHPX: cb=3, sprmCFBold (0x0835) operand 1
          chpxPage(blobOff) = 3
          putU16(chpxPage, blobOff + 1, 0x0835)
          chpxPage(blobOff + 3) = 1
          chpxPage(rgbAt) = (blobOff / 2).toByte
          blobOff -= 6
        } else chpxPage(rgbAt) = 0 // default properties
      }
      chpxPage(511) = crun.toByte
    }

    // ---- PAPX FKP ----
    val papxPage = new Array[Byte](512)
    locally {
      val cpara = paras.size
      for (i <- 0 to cpara) putI32(papxPage, 4 * i, fcOf(bounds(i)))
      var blobOff = 480
      for (i <- 0 until cpara) {
        val p = paras(i)
        val grpprl = {
          val out = new java.io.ByteArrayOutputStream()
          if (p.jc != 0) { out.write(0x03); out.write(0x24); out.write(p.jc) }
          if (p.dxaLeft != 0) {
            out.write(0x0F); out.write(0x84)
            out.write(p.dxaLeft & 0xFF); out.write((p.dxaLeft >> 8) & 0xFF)
          }
          if (p.pageBreakBefore) {
            out.write(0x07); out.write(0x24); out.write(0x01)
          }
          out.toByteArray
        }
        val bxAt = 4 * (cpara + 1) + 13 * i
        // PapxInFkp: cb!=0 -> (2cb-1) bytes = istd(2) + grpprl (odd
        // grpprl); cb==0 -> cb2 byte, 2*cb2 bytes = istd + grpprl (even)
        val blob =
          if (grpprl.length % 2 == 1) {
            val cb = (3 + grpprl.length) / 2
            Array[Byte](cb.toByte, 0, 0) ++ grpprl
          } else {
            val cb2 = (2 + grpprl.length) / 2
            Array[Byte](0, cb2.toByte, 0, 0) ++ grpprl
          }
        blobOff -= (blob.length + (blob.length % 2)) // keep even offsets
        System.arraycopy(blob, 0, papxPage, blobOff, blob.length)
        papxPage(bxAt) = (blobOff / 2).toByte
      }
      papxPage(511) = cpara.toByte
    }

    // ---- WordDocument stream: FIB + text + the two FKP pages ----
    val chpxPn = ((fcTextEnd + 511) / 512)
    val papxPn = chpxPn + 1
    val wordLen = math.max(4096, (papxPn + 1) * 512)
    val word = new Array[Byte](wordLen)
    putU16(word, 0x00, 0xA5EC) // wIdent
    putU16(word, 0x02, 0x00C1) // nFib (Word 97)
    putU16(word, 0x0A, 0x0200) // fWhichTblStm -> 1Table
    putI32(word, 0x4C, textStr.length) // ccpText
    System.arraycopy(textBytes, 0, word, fcText, textBytes.length)
    System.arraycopy(chpxPage, 0, word, chpxPn * 512, 512)
    System.arraycopy(papxPage, 0, word, papxPn * 512, 512)

    // ---- 1Table stream: bin tables + Clx ----
    val tbl = new Array[Byte](4096)
    putI32(tbl, 0, fcText); putI32(tbl, 4, fcTextEnd)
    putI32(tbl, 8, chpxPn) // PlcfBteChpx
    putI32(tbl, 12, fcText); putI32(tbl, 16, fcTextEnd)
    putI32(tbl, 20, papxPn) // PlcfBtePapx
    val fcClx = 24
    tbl(fcClx) = 0x02 // Pcdt
    putI32(tbl, fcClx + 1, 16) // lcbPlcPcd: 2 CPs + 1 PCD
    putI32(tbl, fcClx + 5, 0)
    putI32(tbl, fcClx + 9, textStr.length)
    // PCD: flags 0, fcField = fc (unicode) or (fc*2)|fCompressed, prm 0
    putU16(tbl, fcClx + 13, 0)
    putI32(tbl, fcClx + 15,
      if (unicode) fcText else (fcText * 2) | 0x40000000)
    putU16(tbl, fcClx + 19, 0)

    // FIB pointers into the table stream
    putI32(word, 0xFA, 0); putI32(word, 0xFE, 12)
    putI32(word, 0x102, 12); putI32(word, 0x106, 12)
    putI32(word, 0x1A2, fcClx); putI32(word, 0x1A6, 21)

    cfb(Seq("WordDocument" -> word, "1Table" -> tbl))
  }

  /** Minimal-but-valid CFB container: FAT sectors, one directory
    * sector, FAT-chained streams (each padded past the 4096 mini
    * cutoff so no mini stream exists). No timestamps — byte-stable.
    */
  def cfb(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(streams.size <= 3, "one dir sector in this writer")
    val contents = streams.map { case (n, b) => n -> pad(b, 4096) }
    val streamSectors = contents.map(_._2.length / 512)
    val dirSectors = 1
    // solve FAT count: fatSectors covers itself + dir + streams
    var fatSectors = 1
    while (fatSectors * 128 < fatSectors + dirSectors + streamSectors.sum)
      fatSectors += 1
    val totalSectors = fatSectors + dirSectors + streamSectors.sum
    val fat = Array.fill(fatSectors * 128)(0xFFFFFFFF)
    for (i <- 0 until fatSectors) fat(i) = 0xFFFFFFFD // FATSECT
    val dirStart = fatSectors
    fat(dirStart) = 0xFFFFFFFE // single-sector dir chain
    val streamStarts = new Array[Int](contents.size)
    var cur = dirStart + 1
    for ((n, i) <- streamSectors.zipWithIndex) {
      streamStarts(i) = cur
      for (j <- 0 until n)
        fat(cur + j) = if (j == n - 1) 0xFFFFFFFE else cur + j + 1
      cur += n
    }

    // directory: Root Entry + streams
    val dir = new Array[Byte](512)
    def entry(idx: Int, name: String, objType: Int, start: Int,
              size: Long, child: Int, right: Int): Unit = {
      val off = idx * 128
      val nameBytes = name.getBytes("UTF-16LE")
      System.arraycopy(nameBytes, 0, dir, off, nameBytes.length)
      putU16(dir, off + 0x40, nameBytes.length + 2)
      dir(off + 0x42) = objType.toByte
      dir(off + 0x43) = 1 // black
      putI32(dir, off + 0x44, 0xFFFFFFFF) // left
      putI32(dir, off + 0x48, right)
      putI32(dir, off + 0x4C, child)
      putI32(dir, off + 0x74, start)
      putI64(dir, off + 0x78, size)
    }
    entry(0, "Root Entry", 5, 0xFFFFFFFE, 0L, child = 1, right = 0xFFFFFFFF)
    for (((name, content), i) <- contents.zipWithIndex)
      entry(i + 1, name, 2, streamStarts(i), content.length.toLong,
        child = 0xFFFFFFFF,
        right = if (i + 1 < contents.size) i + 2 else 0xFFFFFFFF)

    // header
    val header = new Array[Byte](512)
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    for (i <- magic.indices) header(i) = magic(i).toByte
    putU16(header, 0x1A, 0x003E) // major version 3
    putU16(header, 0x1C, 0xFFFE) // byte order
    putU16(header, 0x1E, 9)      // 512-byte sectors
    putU16(header, 0x20, 6)      // 64-byte mini sectors
    putI32(header, 0x2C, fatSectors)
    putI32(header, 0x30, dirStart)
    putI32(header, 0x38, 4096)   // mini cutoff
    putI32(header, 0x3C, 0xFFFFFFFE) // no mini FAT
    putI32(header, 0x40, 0)
    putI32(header, 0x44, 0xFFFFFFFE) // no DIFAT sectors
    putI32(header, 0x48, 0)
    for (i <- 0 until 109)
      putI32(header, 0x4C + 4 * i, if (i < fatSectors) i else 0xFFFFFFFF)

    val out = new java.io.ByteArrayOutputStream()
    out.write(header)
    for (i <- 0 until fatSectors) {
      val s = new Array[Byte](512)
      for (j <- 0 until 128) putI32(s, 4 * j, fat(i * 128 + j))
      out.write(s)
    }
    out.write(dir)
    for ((_, content) <- contents) out.write(content)
    out.toByteArray
  }
}
