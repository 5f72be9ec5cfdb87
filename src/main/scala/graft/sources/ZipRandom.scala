package graft.sources

import java.util.zip.Inflater

/** Minimal random-access zip reader over in-memory bytes, driven by the
  * central directory (APPNOTE.TXT §4.3): entry NAMES cost zero
  * inflation, and reading an entry inflates exactly that entry — a
  * real-world DOCX/XLSX whose bulk is embedded media (images routinely
  * 10-100x the XML) costs only the parts the decoder consumes, where a
  * streaming [[java.util.zip.ZipInputStream]] walk must decompress
  * every byte of every entry just to reach the next header.
  *
  * Scope: the subset OPC containers use — methods 0 (stored) and
  * 8 (deflate), no ZIP64 (a >4 GB member exceeds the decode tier's
  * per-file caps anyway), no encryption, comment up to 64 KiB. All
  * reads are bounds-guarded: corrupt offsets/counts throw
  * IllegalArgumentException, which [[BinaryDispatch.safeDecode]] turns
  * into an attributed error row.
  */
object ZipRandom {

  final case class Entry(name: String, method: Int,
                         compressedSize: Long, size: Long, localOff: Long)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o).toLong) | (u16(b, o + 2).toLong << 16)

  /** Central-directory entries in directory order. */
  def entries(bytes: Array[Byte]): Seq[Entry] = {
    // EOCD: 0x06054b50, fixed 22 bytes + comment (<= 64 KiB) — scan
    // backwards from the end
    val minAt = math.max(0, bytes.length - 22 - 0xFFFF)
    var eocd = -1
    var i = bytes.length - 22
    while (i >= minAt && eocd < 0) {
      if ((bytes(i) & 0xFF) == 0x50 && (bytes(i + 1) & 0xFF) == 0x4B &&
          (bytes(i + 2) & 0xFF) == 0x05 && (bytes(i + 3) & 0xFF) == 0x06)
        eocd = i
      i -= 1
    }
    require(eocd >= 0, "no zip end-of-central-directory record")
    val count = u16(bytes, eocd + 10)
    val cdSize = u32(bytes, eocd + 12)
    // prepended-data compensation (ADVICE r05): a self-extracting or
    // prefix-padded archive records offsets relative to the archive
    // START, which sits `delta` bytes into the file; java.util.zip
    // applies the same shift (eocd - (cdOff + cdSize)). delta = 0 for
    // a plain zip; negative deltas (lying EOCD) fail the range checks.
    val delta = eocd - (u32(bytes, eocd + 16) + cdSize)
    val cdOff = u32(bytes, eocd + 16) + delta
    require(cdOff >= 0 && cdOff <= bytes.length - 4,
      "central directory offset out of range")
    val out = Vector.newBuilder[Entry]
    var p = cdOff.toInt
    var k = 0
    while (k < count) {
      require(p + 46 <= bytes.length, "truncated central directory")
      require(u32(bytes, p) == 0x02014B50L, "bad central header signature")
      val flags = u16(bytes, p + 8)
      val method = u16(bytes, p + 10)
      val csize = u32(bytes, p + 20)
      val usize = u32(bytes, p + 24)
      val nameLen = u16(bytes, p + 28)
      val extraLen = u16(bytes, p + 30)
      val commentLen = u16(bytes, p + 32)
      val localOff = u32(bytes, p + 42) + delta
      require(p + 46 + nameLen <= bytes.length, "truncated entry name")
      // EFS flag (bit 11) = UTF-8 names; otherwise CP437 per APPNOTE
      // §D.1 (ADVICE r05). ASCII names decode identically either way.
      val name = new String(bytes, p + 46, nameLen,
        if ((flags & 0x800) != 0) java.nio.charset.StandardCharsets.UTF_8
        else cp437)
      if (!name.endsWith("/")) // directories carry no data
        out += Entry(name, method, csize, usize, localOff)
      p += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    out.result()
  }

  /** CP437, the legacy zip name encoding; UTF-8 fallback if the JRE
    * lacks the charset (ASCII — every OPC name — is identical in both).
    */
  private lazy val cp437: java.nio.charset.Charset =
    if (java.nio.charset.Charset.isSupported("IBM437"))
      java.nio.charset.Charset.forName("IBM437")
    else java.nio.charset.StandardCharsets.UTF_8

  /** Inflate (or copy) exactly one entry, output capped at `cap`. The
    * LOCAL header's name/extra lengths are re-read — they may differ
    * from the central ones (APPNOTE §4.3.7) — so the data offset is
    * exact.
    */
  def read(bytes: Array[Byte], e: Entry, cap: Long): Array[Byte] = {
    val lo = e.localOff.toInt
    require(lo >= 0 && lo + 30 <= bytes.length, "local header out of range")
    require(u32(bytes, lo) == 0x04034B50L, "bad local header signature")
    val nameLen = u16(bytes, lo + 26)
    val extraLen = u16(bytes, lo + 28)
    val dataOff = lo + 30 + nameLen + extraLen
    require(dataOff >= 0 && e.compressedSize >= 0 &&
      dataOff + e.compressedSize <= bytes.length, "entry data out of range")
    require(e.size <= cap, s"zip entry inflates past $cap bytes")
    e.method match {
      case 0 =>
        require(e.compressedSize == e.size, "stored entry size mismatch")
        java.util.Arrays.copyOfRange(bytes, dataOff,
          dataOff + e.size.toInt)
      case 8 =>
        val inf = new Inflater(true) // raw deflate, no zlib wrapper
        try {
          inf.setInput(bytes, dataOff, e.compressedSize.toInt)
          val out = new Array[Byte](e.size.toInt)
          var at = 0
          while (at < out.length && !inf.finished()) {
            require(!inf.needsInput, "truncated deflate stream")
            val n = inf.inflate(out, at, out.length - at)
            require(n > 0 || inf.finished(), "stalled deflate stream")
            at += n
          }
          require(at == out.length, "deflate stream shorter than declared")
          // a lying directory (declared size smaller than the real
          // stream) must error, not silently truncate: probe one byte
          val probe = new Array[Byte](1)
          require(inf.finished() || inf.inflate(probe) == 0,
            "deflate stream larger than declared")
          out
        } finally inf.end()
      case m =>
        throw new IllegalArgumentException(s"unsupported zip method $m")
    }
  }
}
