package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Corrupt-input totality net for the binary decode tier. At corpus
  * scale (10^8+ files) some inputs ARE corrupt — truncated uploads, bit
  * rot, mislabeled blobs — and the distributed scan's per-row contract
  * is [[BinaryDispatch.safeDecode]]: ALWAYS return (ok | error), never
  * throw, never hang, never allocate unboundedly. The sweeps here are
  * seeded and deterministic, so a regression is reproducible.
  */
class DecodeFuzzSpec extends AnyFunSuite {

  private lazy val bases: Seq[(String, Array[Byte])] = Seq(
    "docx" -> OoxmlCorpus.docxBytes(3),
    "xlsx" -> OoxmlCorpus.xlsxBytes(3),
    "doc" -> OoxmlCorpus.docBytes62(3),
    "xls" -> OoxmlCorpus.xlsBytes(3),
    "pdf-flate" -> OoxmlCorpus.pdfBytes(2),
    "pdf-plain" -> OoxmlCorpus.pdfBytes(3))

  private def total(name: String, bytes: Array[Byte]): Unit = {
    val r = BinaryDispatch.safeDecode(bytes)
    assert(r.status == "ok" || r.status == "error", s"$name -> $r")
    if (r.status == "ok") assert(r.decoded.isDefined, name)
    else assert(r.decoded.isEmpty && r.error.nonEmpty, name)
  }

  test("truncation sweep: safeDecode is total on every prefix stride") {
    for ((name, base) <- bases) {
      assert(BinaryDispatch.safeDecode(base).status == "ok", name)
      val stride = math.max(1, base.length / 97)
      var len = 0
      while (len <= base.length) {
        total(s"$name@$len", java.util.Arrays.copyOf(base, len))
        len += stride
      }
    }
  }

  test("seeded bit-flip fuzz: safeDecode never throws") {
    val rnd = new scala.util.Random(42)
    for ((name, base) <- bases; trial <- 0 until 60) {
      val b = base.clone()
      val flips = 1 + rnd.nextInt(8)
      for (_ <- 0 until flips) {
        val at = rnd.nextInt(b.length)
        b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
      }
      total(s"$name#$trial", b)
    }
  }

  test("random garbage decodes (text fallback) or errors, never throws") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 60) {
      val b = new Array[Byte](rnd.nextInt(4096))
      rnd.nextBytes(b)
      total(s"garbage#$trial", b)
    }
  }

  test("q69 corrupt recipes fail deterministically with the pinned family") {
    for (i <- 0 until OoxmlCorpus.nCorrupt) {
      val pdf = BinaryDispatch.safeDecode(OoxmlCorpus.corruptPdfBytes(i))
      assert(pdf.format == "pdf" && pdf.status == "error", s"pdf $i -> $pdf")
      val cfb = BinaryDispatch.safeDecode(OoxmlCorpus.corruptCfbBytes(i))
      assert(cfb.format == "cfb" && cfb.status == "error", s"cfb $i -> $cfb")
      val zip = BinaryDispatch.safeDecode(OoxmlCorpus.corruptZipBytes(i))
      assert(zip.format == "zip" && zip.status == "error", s"zip $i -> $zip")
      val txt = BinaryDispatch.safeDecode(OoxmlCorpus.garbageBytes(i))
      assert(txt.format == "text" && txt.status == "ok", s"text $i -> $txt")
    }
  }

  test("flate bomb is rejected by the inflation cap, not task memory") {
    // a 1 MB zlib stream of zeros inflates ~1000x per level; nest the
    // PDF around a stream declaring FlateDecode over highly-compressible
    // bytes and cap-check via a tiny synthetic: deflate 512 MB of zeros
    // down and confirm the decoder throws the cap error instead of
    // materializing it
    val deflater = new java.util.zip.Deflater(9)
    val zeros = new Array[Byte](4 * 1024 * 1024)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    deflater.setInput(zeros)
    for (_ <- 0 until 128) { // 128 x 4 MB = 512 MB declared
      var n = deflater.deflate(buf)
      while (n > 0) { out.write(buf, 0, n); n = deflater.deflate(buf) }
      deflater.setInput(zeros)
    }
    deflater.finish()
    var n = deflater.deflate(buf)
    while (n > 0) { out.write(buf, 0, n); n = deflater.deflate(buf) }
    val flate = out.toByteArray
    val pdf = new java.io.ByteArrayOutputStream()
    val head = "%PDF-1.4\n1 0 obj << /Length " + flate.length +
      " /Filter /FlateDecode >>\nstream\n"
    pdf.write(head.getBytes("ISO-8859-1"))
    pdf.write(flate)
    pdf.write("\nendstream\nendobj\n".getBytes("ISO-8859-1"))
    val r = BinaryDispatch.safeDecode(pdf.toByteArray)
    assert(r.status == "error", r.toString)
    assert(r.error == "IllegalArgumentException", r.toString)
  }
}
