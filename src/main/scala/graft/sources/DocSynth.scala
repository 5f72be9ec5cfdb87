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
    * (0 left / 1 center / 2 right), left indent in twips, page break,
    * and the Word97 list reference (ilfo = 1-based index into the
    * `lists` passed to [[doc]], via sprmPIlfo/sprmPIlvl).
    *
    * Table paragraphs (r05): `inTable` writes sprmPFInTable (0x2416),
    * `ttp` additionally writes sprmPFTtp (0x2417) — the row-terminator
    * paragraph; `mark` is the paragraph-end char stored in the text
    * stream (0x0D for plain paragraphs, 0x07 for cell ends and TTPs —
    * MS-DOC 2.4.3 table-depth delimiters). Prefer [[tableParas]] over
    * setting these by hand.
    */
  final case class DocP(text: String, bold: Boolean = false, jc: Int = 0,
                        dxaLeft: Int = 0, pageBreakBefore: Boolean = false,
                        ilfo: Int = 0, ilvl: Int = 0,
                        inTable: Boolean = false, ttp: Boolean = false,
                        mark: Char = '\r')

  /** Word97 table layout from rows -> cells -> cell paragraphs: every
    * cell's last paragraph ends with the 0x07 cell mark, inner cell
    * paragraphs keep 0x0D, and each row is closed by an empty TTP
    * paragraph (0x07 mark + sprmPFTtp) — the byte shape POI's
    * TableIterator consumes.
    */
  def tableParas(rows: Seq[Seq[Seq[DocP]]]): Seq[DocP] =
    rows.flatMap { row =>
      row.flatMap { cellParas =>
        cellParas.zipWithIndex.map { case (p, k) =>
          p.copy(inTable = true,
            mark = if (k == cellParas.size - 1) '\u0007' else '\r')
        }
      } :+ DocP("", inTable = true, ttp = true, mark = '\u0007')
    }

  /** One LVL of a synthesized list: startAt, number-format code
    * (23 = bullet), and the xst number text whose `(char)l` chars are
    * level-number placeholders — the POI `getNumberText()` convention
    * the reference's DOC prefix machine substitutes
    * (DocumentParser.java:174-178).
    */
  final case class Lvl(startAt: Int = 1, nfc: Int = 0, xst: String = "")

  /** One list (LSTF + its 9 LVLs; missing levels default). */
  final case class Lst(lsid: Int, levels: Seq[Lvl])

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
  }
  private def putI32(b: Array[Byte], off: Int, v: Int): Unit =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).putInt(v)
  private def putI64(b: Array[Byte], off: Int, v: Long): Unit =
    ByteBuffer.wrap(b, off, 8).order(ByteOrder.LITTLE_ENDIAN).putLong(v)

  private def pad(b: Array[Byte], to: Int): Array[Byte] =
    java.util.Arrays.copyOf(b, math.max(to, ((b.length + 511) / 512) * 512))

  /** Build a .doc from paragraph specs. `unicode = true` stores text
    * pieces as UTF-16LE (fCompressed = 0 — required for non-cp1252
    * content); default is the compressed cp1252 piece Word writes for
    * Latin text. `pieceChars > 0` splits the text into ceil(len/n)
    * pieces — alternating cp1252/UTF-16 encodings when `unicode` is
    * false — modeling the fragmented piece tables heavily-edited real
    * files carry. `lists` + DocP.ilfo/ilvl write real PlfLst/PlfLfo
    * tables; `xaPage > 0` writes a section table (PlcfSed -> Sepx with
    * sprmSXaPage) overriding the 12240-twip default page width.
    */
  def doc(paras: Seq[DocP], unicode: Boolean = false,
          lists: Seq[Lst] = Nil, xaPage: Int = 0,
          pieceChars: Int = 0): Array[Byte] = {
    val textStr = paras.map(p => p.text + p.mark).mkString
    val fcText = 1024

    // ---- text pieces: (cpStart, chars, unicode, fc) ----
    final case class SynthPiece(cpStart: Int, chars: String,
                                wide: Boolean, fc: Int)
    val pieces: Seq[SynthPiece] = {
      val chunks: Seq[(Int, String)] =
        if (pieceChars <= 0) Seq(0 -> textStr)
        else (0 until textStr.length by pieceChars)
          .map(s => s -> textStr.substring(s,
            math.min(textStr.length, s + pieceChars)))
      var fc = fcText
      chunks.zipWithIndex.map { case ((cpS, chunk), k) =>
        val wide = unicode || (pieceChars > 0 && k % 2 == 1)
        if (!wide) require(new String(chunk.getBytes("windows-1252"),
          "windows-1252") == chunk,
          "non-cp1252 text needs unicode = true (unmappable chars become '?')")
        val p = SynthPiece(cpS, chunk, wide, fc)
        fc += chunk.length * (if (wide) 2 else 1)
        p
      }
    }
    val fcTextEnd =
      pieces.last.fc + pieces.last.chars.length * (if (pieces.last.wide) 2 else 1)
    def fcOf(cp: Int): Int = {
      val p = pieces.reverseIterator.find(_.cpStart <= cp).get
      p.fc + (cp - p.cpStart) * (if (p.wide) 2 else 1)
    }

    // paragraph cp ranges incl. their marks
    val bounds = paras.foldLeft(Seq(0)) { (acc, p) =>
      acc :+ (acc.last + p.text.length + 1)
    }

    // ---- CHPX FKP pages (one run per paragraph incl. its mark),
    // grouped so any paragraph count fits — multi-page documents get a
    // real multi-entry bin table, like real files ----
    val chpxGroups: Seq[Seq[Int]] =
      paras.indices.grouped(16).map(_.toSeq).toSeq
    val chpxPages: Seq[Array[Byte]] = chpxGroups.map { group =>
      val page = new Array[Byte](512)
      val crun = group.size
      for ((pi, i) <- group.zipWithIndex)
        putI32(page, 4 * i, fcOf(bounds(pi)))
      putI32(page, 4 * crun, fcOf(bounds(group.last + 1)))
      var blobOff = 504
      for ((pi, i) <- group.zipWithIndex) {
        val rgbAt = 4 * (crun + 1) + i
        if (paras(pi).bold) {
          // CHPX: cb=3, sprmCFBold (0x0835) operand 1
          page(blobOff) = 3
          putU16(page, blobOff + 1, 0x0835)
          page(blobOff + 3) = 1
          page(rgbAt) = (blobOff / 2).toByte
          blobOff -= 6
        } else page(rgbAt) = 0 // default properties
        require(blobOff > 4 * (crun + 1) + crun, "synth CHPX capacity")
      }
      page(511) = crun.toByte
      page
    }

    // ---- PAPX FKP pages ----
    val papxGroups: Seq[Seq[Int]] =
      paras.indices.grouped(8).map(_.toSeq).toSeq
    val papxPages: Seq[Array[Byte]] = papxGroups.map { group =>
      val page = new Array[Byte](512)
      val cpara = group.size
      for ((pi, i) <- group.zipWithIndex)
        putI32(page, 4 * i, fcOf(bounds(pi)))
      putI32(page, 4 * cpara, fcOf(bounds(group.last + 1)))
      var blobOff = 480
      for ((pi, i) <- group.zipWithIndex) {
        val p = paras(pi)
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
          if (p.ilfo != 0) { // sprmPIlfo
            out.write(0x0B); out.write(0x46)
            out.write(p.ilfo & 0xFF); out.write((p.ilfo >> 8) & 0xFF)
          }
          if (p.ilvl != 0) { // sprmPIlvl
            out.write(0x0A); out.write(0x26); out.write(p.ilvl)
          }
          if (p.inTable) { // sprmPFInTable
            out.write(0x16); out.write(0x24); out.write(0x01)
          }
          if (p.ttp) { // sprmPFTtp
            out.write(0x17); out.write(0x24); out.write(0x01)
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
        require(blobOff > 4 * (cpara + 1) + 13 * cpara, "synth PAPX capacity")
        System.arraycopy(blob, 0, page, blobOff, blob.length)
        page(bxAt) = (blobOff / 2).toByte
      }
      page(511) = cpara.toByte
      page
    }

    // ---- WordDocument stream: FIB + text pieces + FKP pages + Sepx ----
    val chpxPn0 = ((fcTextEnd + 511) / 512)
    val papxPn0 = chpxPn0 + chpxPages.size
    val fcSepx = (papxPn0 + papxPages.size) * 512
    val sepxGrpprl: Array[Byte] =
      if (xaPage > 0) Array(0x1F.toByte, 0xB0.toByte, // sprmSXaPage
        (xaPage & 0xFF).toByte, ((xaPage >> 8) & 0xFF).toByte)
      else Array.emptyByteArray
    val wordLen = math.max(4096,
      fcSepx + (if (xaPage > 0) 2 + sepxGrpprl.length else 0))
    val word = new Array[Byte](wordLen)
    putU16(word, 0x00, 0xA5EC) // wIdent
    putU16(word, 0x02, 0x00C1) // nFib (Word 97)
    putU16(word, 0x0A, 0x0200) // fWhichTblStm -> 1Table
    putI32(word, 0x4C, textStr.length) // ccpText
    for (p <- pieces) {
      val enc = if (p.wide) "UTF-16LE" else "windows-1252"
      val b = p.chars.getBytes(enc)
      System.arraycopy(b, 0, word, p.fc, b.length)
    }
    for ((page, k) <- chpxPages.zipWithIndex)
      System.arraycopy(page, 0, word, (chpxPn0 + k) * 512, 512)
    for ((page, k) <- papxPages.zipWithIndex)
      System.arraycopy(page, 0, word, (papxPn0 + k) * 512, 512)
    if (xaPage > 0) {
      putU16(word, fcSepx, sepxGrpprl.length) // Sepx cb
      System.arraycopy(sepxGrpprl, 0, word, fcSepx + 2, sepxGrpprl.length)
    }

    // ---- 1Table stream: bin tables, PlcfSed, PlfLst, PlfLfo, Clx ----
    val tblOut = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { tblOut.write(v & 0xFF); tblOut.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = {
      tblOut.write(v & 0xFF); tblOut.write((v >> 8) & 0xFF)
      tblOut.write((v >> 16) & 0xFF); tblOut.write((v >> 24) & 0xFF)
    }
    // CHPX bin table at 0, PAPX bin table right after — (n+1) FC
    // boundaries then n FKP page numbers each
    val fcBteChpx = 0
    for (g <- chpxGroups) w32(fcOf(bounds(g.head)))
    w32(fcTextEnd)
    for (k <- chpxPages.indices) w32(chpxPn0 + k)
    val lcbBteChpx = tblOut.size() - fcBteChpx
    val fcBtePapx = tblOut.size()
    for (g <- papxGroups) w32(fcOf(bounds(g.head)))
    w32(fcTextEnd)
    for (k <- papxPages.indices) w32(papxPn0 + k)
    val lcbBtePapx = tblOut.size() - fcBtePapx
    // PlcfSed (one Sed covering the whole text)
    val fcPlcfSed = tblOut.size()
    val lcbPlcfSed = if (xaPage > 0) {
      w32(0); w32(textStr.length)              // CPs
      w16(0); w32(fcSepx); w16(0); w32(0)      // Sed: fn, fcSepx, fnMpd, fcMpd
      20
    } else 0
    // PlfLst: cLst LSTFs then, per list, 9 LVLs (cbGrpprl* = 0)
    val fcPlfLst = tblOut.size()
    val lcbPlfLst = if (lists.nonEmpty) {
      val start = tblOut.size()
      w16(lists.size)
      for (l <- lists) {
        w32(l.lsid); w32(0)
        for (_ <- 0 until 9) w16(0x0FFF) // rgistdPara: no style
        tblOut.write(0) // flags: fSimpleList = 0
        tblOut.write(0) // grfhic
      }
      for (l <- lists; lvl <- 0 until 9) {
        val v = l.levels.lift(lvl).getOrElse(Lvl())
        w32(v.startAt)
        tblOut.write(v.nfc)
        tblOut.write(0)                    // jc/flags
        for (_ <- 0 until 9) tblOut.write(0) // rgbxchNums
        tblOut.write(0)                    // ixchFollow
        w32(0); w32(0)                     // dxaIndentSav, unused
        tblOut.write(0); tblOut.write(0)   // cbGrpprlChpx, cbGrpprlPapx
        tblOut.write(0); tblOut.write(0)   // ilvlRestartLim, grfhic
        val xst = v.xst.getBytes("UTF-16LE")
        w16(v.xst.length)
        tblOut.write(xst, 0, xst.length)
      }
      tblOut.size() - start
    } else 0
    // PlfLfo: ilfo k (1-based) -> lists(k-1).lsid, no LFOLVL overrides
    val fcPlfLfo = tblOut.size()
    val lcbPlfLfo = if (lists.nonEmpty) {
      w32(lists.size)
      for (l <- lists) {
        w32(l.lsid); w32(0); w32(0)
        tblOut.write(0)  // clfolvl
        tblOut.write(0); tblOut.write(0); tblOut.write(0)
      }
      4 + 16 * lists.size
    } else 0
    // Clx -> Pcdt -> PlcPcd over all pieces
    val fcClx = tblOut.size()
    val n = pieces.size
    val lcbPlcPcd = 4 * (n + 1) + 8 * n
    tblOut.write(0x02) // Pcdt
    w32(lcbPlcPcd)
    for (p <- pieces) w32(p.cpStart)
    w32(textStr.length)
    for (p <- pieces) {
      // PCD: flags 0, fcField = fc (wide) or (fc*2)|fCompressed, prm 0
      w16(0)
      w32(if (p.wide) p.fc else (p.fc * 2) | 0x40000000)
      w16(0)
    }
    val lcbClx = tblOut.size() - fcClx
    val tbl = pad(tblOut.toByteArray, 4096)

    // FIB pointers into the table stream
    putI32(word, 0xFA, fcBteChpx); putI32(word, 0xFE, lcbBteChpx)
    putI32(word, 0x102, fcBtePapx); putI32(word, 0x106, lcbBtePapx)
    putI32(word, 0x1A2, fcClx); putI32(word, 0x1A6, lcbClx)
    putI32(word, 0xCA, fcPlcfSed); putI32(word, 0xCE, lcbPlcfSed)
    putI32(word, 0x2E2, fcPlfLst); putI32(word, 0x2E6, lcbPlfLst)
    putI32(word, 0x2EA, fcPlfLfo); putI32(word, 0x2EE, lcbPlfLfo)

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
