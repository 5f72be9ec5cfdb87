package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.OoxmlSynth.P

class ZipRandomSpec extends AnyFunSuite {

  test("central-directory entries match the streaming walk and reads " +
      "are byte-identical (deflated + stored)") {
    val b = OoxmlSynth.docx(Seq(P.plain("hello zip random")))
    val streamed = OoxmlDecode.zipEntries(b)
    val es = ZipRandom.entries(b)
    assert(es.map(_.name).toSet == streamed.keySet)
    for (e <- es)
      assert(ZipRandom.read(b, e, Long.MaxValue)
        .sameElements(streamed(e.name)), e.name)
    // stored (method 0) entries too
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    val payload = "stored payload".getBytes("UTF-8")
    val ze = new java.util.zip.ZipEntry("a.txt")
    ze.setMethod(java.util.zip.ZipOutputStream.STORED)
    ze.setSize(payload.length)
    ze.setCompressedSize(payload.length)
    val crc = new java.util.zip.CRC32(); crc.update(payload)
    ze.setCrc(crc.getValue)
    zos.putNextEntry(ze); zos.write(payload); zos.closeEntry(); zos.close()
    val sb = bos.toByteArray
    val se = ZipRandom.entries(sb)
    assert(se.size == 1 && se.head.method == 0)
    assert(ZipRandom.read(sb, se.head, Long.MaxValue)
      .sameElements(payload))
  }

  test("embedded media never inflates: wanted parts read under a cap " +
      "smaller than the media") {
    // 2 MiB of 'A' deflates to ~2 KB — a streaming walk must inflate
    // it to reach the next entry; the central-directory path must not
    val media = "A" * (2 * 1024 * 1024)
    val zip = OoxmlSynth.zip(Seq(
      "word/document.xml" -> "<w:document/>",
      "word/media/image1.bin" -> media,
      "word/styles.xml" -> "<w:styles/>"))
    val cap = 64 * 1024L
    intercept[IllegalArgumentException] {
      OoxmlDecode.zipEntries(zip, cap) // streaming: bombs past the cap
    }
    val kept = OoxmlDecode.zipEntriesWhere(zip,
      Set("word/document.xml", "word/styles.xml"), cap)
    assert(kept.keySet ==
      Set("word/document.xml", "word/styles.xml"))
    assert(new String(kept("word/document.xml"), "UTF-8") ==
      "<w:document/>")
    // and the dispatch sniff reads NAMES at zero inflation
    assert(OoxmlDecode.zipEntryNames(zip).contains("word/media/image1.bin"))
  }

  test("lying central-directory sizes error instead of silently " +
      "truncating or over-reading") {
    val zip = OoxmlSynth.zip(Seq("word/document.xml" ->
      "a deterministic payload long enough to deflate meaningfully"))
    // first central header: signature PK\x01\x02; uncompressed size at
    // +24 (little-endian u32)
    def patched(delta: Int): Array[Byte] = {
      val b = zip.clone()
      var i = 0
      var at = -1
      while (at < 0 && i < b.length - 4) {
        if ((b(i) & 0xFF) == 0x50 && (b(i + 1) & 0xFF) == 0x4B &&
            (b(i + 2) & 0xFF) == 0x01 && (b(i + 3) & 0xFF) == 0x02) at = i
        i += 1
      }
      assert(at > 0, "central header not found")
      val o = at + 24
      val v = (b(o) & 0xFF) + delta
      b(o) = v.toByte
      b
    }
    for (delta <- Seq(-1, 1)) {
      val b = patched(delta)
      val e = ZipRandom.entries(b).head
      intercept[IllegalArgumentException] {
        ZipRandom.read(b, e, Long.MaxValue)
      }
    }
  }

  test("seeded randomized parity: arbitrary entry sets read " +
      "byte-identical to the streaming walk") {
    val rnd = new scala.util.Random(
      sys.env.getOrElse("FUZZ_SEED", "42").toLong + 2)
    for (trial <- 0 until 20) {
      val n = 1 + rnd.nextInt(12)
      val entries = (0 until n).map { k =>
        val name = s"dir$k/part$k.bin"
        val size = rnd.nextInt(100000)
        val data = new Array[Byte](size)
        if (rnd.nextBoolean()) rnd.nextBytes(data) // incompressible half
        (name, data)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      for ((name, data) <- entries) {
        zos.putNextEntry(new java.util.zip.ZipEntry(name))
        zos.write(data); zos.closeEntry()
      }
      zos.close()
      val zip = bos.toByteArray
      val streamed = OoxmlDecode.zipEntries(zip)
      val es = ZipRandom.entries(zip)
      assert(es.map(_.name) == entries.map(_._1), s"trial $trial")
      for (e <- es)
        assert(ZipRandom.read(zip, e, Long.MaxValue)
          .sameElements(streamed(e.name)), s"trial $trial ${e.name}")
    }
  }

  test("corrupt containers error, never hang: missing EOCD, bad " +
      "offsets, truncated directory") {
    intercept[IllegalArgumentException] {
      ZipRandom.entries("PK not a full zip".getBytes)
    }
    val good = OoxmlSynth.zip(Seq("x.xml" -> "<x/>"))
    for (len <- Seq(4, 30, good.length - 3)) {
      intercept[Exception] {
        val t = java.util.Arrays.copyOf(good, len)
        ZipRandom.entries(t).foreach(e => ZipRandom.read(t, e, 1L << 20))
      }
    }
  }

  test("prefix-padded (self-extracting) zips decode: offsets shifted by " +
      "eocd - (cdOff + cdSize), like java.util.zip (ADVICE r05)") {
    val plain = OoxmlSynth.docx(Seq(P.plain("prefixed zip payload")))
    val padded = ("SFX STUB BYTES " * 5).getBytes("ISO-8859-1") ++ plain
    val es = ZipRandom.entries(padded)
    assert(es.map(_.name).toSet == ZipRandom.entries(plain).map(_.name).toSet)
    for (e <- es) {
      val want = ZipRandom.read(plain,
        ZipRandom.entries(plain).find(_.name == e.name).get, Long.MaxValue)
      assert(ZipRandom.read(padded, e, Long.MaxValue).sameElements(want),
        e.name)
    }
    // java.util.zip agrees on the padded form
    val tmp = java.nio.file.Files.createTempFile("graft_sfx", ".zip")
    java.nio.file.Files.write(tmp, padded)
    val zf = new java.util.zip.ZipFile(tmp.toFile)
    try assert(zf.size() == es.size ||
      zf.size() == ZipRandom.entries(plain).size)
    finally { zf.close(); java.nio.file.Files.delete(tmp) }
  }
}
