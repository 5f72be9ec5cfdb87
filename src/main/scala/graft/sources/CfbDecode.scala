package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Compound File Binary (OLE2 / MS-CFB) container reader with JDK-only
  * parts — the container under .doc/.xls, which the reference opens
  * through POI's HWPF/HSSF (`DocumentParser.java:109`,
  * `ExcelParser.java:63`). Implements the published MS-CFB structure:
  * header + DIFAT -> FAT -> directory chain -> per-stream sector chains,
  * including the mini-FAT path for streams under the mini cutoff.
  *
  * Untrusted-input hardening: all sector and chain walks are bounded by
  * the file size and a visited-set (a cyclic FAT chain terminates with
  * an error, not an infinite loop), matching the zip-side guard
  * ([[OoxmlDecode.maxInflatedBytes]] rationale).
  */
object CfbDecode {

  private val HeaderMagic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A,
    0xE1).map(_.toByte)
  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  final case class Entry(name: String, objType: Int, startSector: Int,
                         size: Long)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
  private def i64(b: Array[Byte], off: Int): Long =
    ByteBuffer.wrap(b, off, 8).order(ByteOrder.LITTLE_ENDIAN).getLong

  /** All stream entries (objType 2) by name -> exact-size content. */
  def streams(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    require(bytes.length >= 512 &&
      HeaderMagic.indices.forall(i => bytes(i) == HeaderMagic(i)),
      "not a CFB (OLE2) container")
    val sectorSize = 1 << u16(bytes, 0x1E)
    val miniSize = 1 << u16(bytes, 0x20)
    val firstDirSector = i32(bytes, 0x30)
    val miniCutoff = i32(bytes, 0x38)
    val firstMiniFat = i32(bytes, 0x3C)
    val firstDifat = i32(bytes, 0x44)
    val maxSectors = (bytes.length / sectorSize) + 1

    def sector(i: Int): Array[Byte] = {
      val off = (i + 1) * sectorSize
      require(off >= 0 && off + sectorSize <= bytes.length,
        s"sector $i out of range")
      java.util.Arrays.copyOfRange(bytes, off, off + sectorSize)
    }

    // DIFAT: 109 header entries + chained DIFAT sectors (last 4 bytes of
    // each DIFAT sector point to the next)
    val fatSectorIds = scala.collection.mutable.ArrayBuffer[Int]()
    for (i <- 0 until 109) {
      val v = i32(bytes, 0x4C + 4 * i)
      if (v != FreeSect) fatSectorIds += v
    }
    var difat = firstDifat
    // numDifatSectors is untrusted; the only sound bounds are the file
    // itself: a DIFAT sector must exist in the file (maxSectors) and
    // can appear once (cycle guard) — without these a self-pointing
    // DIFAT sector spins ~2^31 iterations growing fatSectorIds
    val difatSeen = scala.collection.mutable.Set[Int]()
    while (difat != EndOfChain && difat != FreeSect) {
      require(difatSeen.add(difat) && difatSeen.size <= maxSectors,
        s"bad DIFAT chain at sector $difat")
      val s = sector(difat)
      for (i <- 0 until sectorSize / 4 - 1) {
        val v = i32(s, 4 * i)
        if (v != FreeSect) fatSectorIds += v
      }
      difat = i32(s, sectorSize - 4)
    }
    val fat: Array[Int] =
      fatSectorIds.toArray.flatMap(id => {
        val s = sector(id)
        (0 until sectorSize / 4).map(i => i32(s, 4 * i))
      })

    def chain(start: Int): Seq[Int] = {
      val out = scala.collection.mutable.ArrayBuffer[Int]()
      val seen = scala.collection.mutable.Set[Int]()
      var cur = start
      while (cur != EndOfChain && cur != FreeSect) {
        require(cur >= 0 && cur < fat.length && seen.add(cur) &&
          out.size <= maxSectors, s"bad FAT chain at sector $cur")
        out += cur
        cur = fat(cur)
      }
      out.toSeq
    }

    def readChain(start: Int, size: Long): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      chain(start).foreach(s => buf.write(sector(s)))
      // a directory entry's declared size is untrusted: it must fit the
      // bytes its chain actually provides, else a corrupt 2 GB size field
      // would drive a 2 GB zero-fill allocation here
      require(size >= 0 && size <= buf.size,
        s"stream size $size exceeds chain bytes ${buf.size}")
      java.util.Arrays.copyOf(buf.toByteArray, size.toInt)
    }

    // directory entries: 128 bytes each across the directory chain
    val dirBytes = {
      val buf = new java.io.ByteArrayOutputStream()
      chain(firstDirSector).foreach(s => buf.write(sector(s)))
      buf.toByteArray
    }
    val entries = (0 until dirBytes.length / 128).map { i =>
      val off = i * 128
      val nameLen = u16(dirBytes, off + 0x40)
      val name =
        if (nameLen >= 2)
          new String(dirBytes, off, nameLen - 2, "UTF-16LE")
        else ""
      Entry(name, dirBytes(off + 0x42) & 0xFF,
        i32(dirBytes, off + 0x74), i64(dirBytes, off + 0x78))
    }.filter(_.objType != 0)

    // mini stream: the root entry's FAT chain holds the data; the
    // mini-FAT (its own FAT chain) maps 64-byte mini sectors
    val root = entries.find(_.objType == 5)
    lazy val miniStream: Array[Byte] = root
      .map(r => readChain(r.startSector, r.size))
      .getOrElse(Array.emptyByteArray)
    lazy val miniFat: Array[Int] = {
      if (firstMiniFat == EndOfChain || firstMiniFat == FreeSect)
        Array.empty[Int]
      else chain(firstMiniFat).toArray.flatMap(id => {
        val s = sector(id)
        (0 until sectorSize / 4).map(i => i32(s, 4 * i))
      })
    }
    def readMiniChain(start: Int, size: Long): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      val seen = scala.collection.mutable.Set[Int]()
      var cur = start
      while (cur != EndOfChain && cur != FreeSect) {
        require(cur >= 0 && cur < miniFat.length && seen.add(cur),
          s"bad mini-FAT chain at $cur")
        val off = cur * miniSize
        require(off + miniSize <= miniStream.length, "mini sector range")
        buf.write(miniStream, off, miniSize)
        cur = miniFat(cur)
      }
      require(size >= 0 && size <= buf.size,
        s"mini stream size $size exceeds chain bytes ${buf.size}")
      java.util.Arrays.copyOf(buf.toByteArray, size.toInt)
    }

    entries.filter(_.objType == 2).map { e =>
      val content =
        if (e.size < miniCutoff) readMiniChain(e.startSector, e.size)
        else readChain(e.startSector, e.size)
      e.name -> content
    }.toMap
  }
}
