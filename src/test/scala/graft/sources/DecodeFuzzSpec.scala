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
    "pdf-plain" -> OoxmlCorpus.pdfBytes(3),
    // the decode-machinery-rich variants: ObjStm+XRef-stream files,
    // Predictor-coded Flate, ToUnicode CMaps, Identity-H CID fonts —
    // each adds parsing surface a flipped bit can land in
    "pdf-objstm" -> OoxmlCorpus.pdfBytes(5),
    "pdf-predictor" -> OoxmlCorpus.pdfBytes(8),
    "pdf-cmap" -> OoxmlCorpus.pdfBytes(9),
    "pdf-cid" -> OoxmlCorpus.pdfBytes(10),
    "pdf-textstate" -> OoxmlCorpus.pdfBytes(11),
    "pdf-tjrows" -> OoxmlCorpus.pdfBytes(12))

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
    val rnd = new scala.util.Random(sys.env.getOrElse("FUZZ_SEED","42").toLong)
    for ((name, base) <- bases; trial <- 0 until sys.env.getOrElse("FUZZ_TRIALS","60").toInt) {
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
    val rnd = new scala.util.Random(sys.env.getOrElse("FUZZ_SEED","7").toLong + 1)
    for (trial <- 0 until sys.env.getOrElse("FUZZ_TRIALS","60").toInt) {
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

  /** Deflate of `mb` MB of zeros (a ~1000x-ratio flate blob). */
  private def zeroBomb(mb: Int): Array[Byte] = {
    val deflater = new java.util.zip.Deflater(9)
    val zeros = new Array[Byte](1024 * 1024)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    deflater.setInput(zeros)
    for (_ <- 0 until mb) {
      var n = deflater.deflate(buf)
      while (n > 0) { out.write(buf, 0, n); n = deflater.deflate(buf) }
      deflater.setInput(zeros)
    }
    deflater.finish()
    var n = deflater.deflate(buf)
    while (n > 0) { out.write(buf, 0, n); n = deflater.deflate(buf) }
    out.toByteArray
  }

  private def pdfWithStreams(flates: Seq[Array[Byte]]): Array[Byte] = {
    val pdf = new java.io.ByteArrayOutputStream()
    pdf.write("%PDF-1.4\n".getBytes("ISO-8859-1"))
    flates.zipWithIndex.foreach { case (flate, i) =>
      val head = s"${i + 1} 0 obj << /Length ${flate.length}" +
        " /Filter /FlateDecode >>\nstream\n"
      pdf.write(head.getBytes("ISO-8859-1"))
      pdf.write(flate)
      pdf.write("\nendstream\nendobj\n".getBytes("ISO-8859-1"))
    }
    pdf.toByteArray
  }

  test("flate bomb is rejected by the inflation budget, not task memory") {
    // one 512 MB bomb: the budget error must be the SPECIFIC failure
    // (asserted on the message via the raw decoder — a generic
    // no-/Catalog error after materializing 512 MB would also reach
    // status=error, which is exactly the regression this test pins out)
    val bombPdf = pdfWithStreams(Seq(zeroBomb(512)))
    val e = intercept[IllegalArgumentException] {
      PdfDecode.pages(bombPdf)
    }
    assert(e.getMessage.contains("inflate past"), e.getMessage)
    val r = BinaryDispatch.safeDecode(bombPdf)
    assert(r.status == "error" && r.error == "IllegalArgumentException",
      r.toString)
  }

  test("many sub-cap bombs share one per-file budget") {
    // 10 x 30 MB streams: each under the cap, 300 MB total over it —
    // the per-file budget must fire even though no single stream trips
    val bomb = zeroBomb(30)
    val e = intercept[IllegalArgumentException] {
      PdfDecode.pages(pdfWithStreams(Seq.fill(10)(bomb)))
    }
    assert(e.getMessage.contains("inflate past"), e.getMessage)
  }

  test("/Length handling: over-declared falls back to the endstream " +
    "scan, 11-digit does not throw, binary 'endobj' in payload is fine") {
    def pdfOne(lengthDecl: String, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(("%PDF-1.4\n1 0 obj << /Length " + lengthDecl +
        " >>\nstream\n").getBytes("ISO-8859-1"))
      out.write(payload)
      out.write("\nendstream\nendobj\n".getBytes("ISO-8859-1"))
      out.toByteArray
    }
    val payload = "BT (hello) Tj ET".getBytes("ISO-8859-1")
    // over-declared: larger than the stream but smaller than the file
    val over = PdfDecode.objects(pdfOne("999999", payload))
    assert(over(1).stream.isDefined &&
      new String(over(1).stream.get, "ISO-8859-1").contains("hello"))
    // 11 digits: must not throw NumberFormatException at the parse
    val huge = PdfDecode.objects(pdfOne("30000000000", payload))
    assert(huge(1).stream.isDefined)
    // 20 digits (over Long.MaxValue): the guarded parse must fall back,
    // not throw NumberFormatException
    val huge20 = PdfDecode.objects(pdfOne("99999999999999999999", payload))
    assert(huge20(1).stream.isDefined)
    // exact length whose payload CONTAINS the byte sequence "endobj":
    // the declared length must win over the embedded keyword
    val tricky = "AAAendobjBBBendstreamCCC".getBytes("ISO-8859-1")
    val exact = PdfDecode.objects(pdfOne(tricky.length.toString, tricky))
    assert(exact(1).stream.exists(_.sameElements(tricky)),
      exact(1).stream.map(b => new String(b, "ISO-8859-1")).toString)
    // valid length with a SPACE (not EOL) before endstream: the
    // whitespace-tolerant gate must still accept the declared length
    val spaced = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(("%PDF-1.4\n1 0 obj << /Length " + tricky.length +
        " >>\nstream\n").getBytes("ISO-8859-1"))
      out.write(tricky)
      out.write("  endstream\nendobj\n".getBytes("ISO-8859-1"))
      out.toByteArray
    }
    assert(PdfDecode.objects(spaced)(1).stream
      .exists(_.sameElements(tricky)))
    // null content must come back as an error row, not an escaped NPE
    val nullRow = BinaryDispatch.safeDecode(null)
    assert(nullRow.status == "error" && nullRow.error == "NullContent")
  }

  test("stalled inflater (truncated FlateDecode stream) is an error " +
    "row, not silently truncated 'ok' text") {
    // take a real compressed corpus PDF and cut the flate stream short:
    // the inflater stalls needing input — pre-fix this returned the
    // partial bytes as success (silent data corruption)
    val good = OoxmlCorpus.pdfBytes(2) // compressed variant
    assert(BinaryDispatch.safeDecode(good).status == "ok")
    val s = new String(good, "ISO-8859-1")
    val streamAt = s.indexOf("stream\n") + "stream\n".length
    val endAt = s.indexOf("endstream", streamAt)
    assert(streamAt > 0 && endAt > streamAt)
    // drop the tail half of the flate payload, splice the rest back
    val keep = streamAt + (endAt - streamAt) / 2
    val cut = new java.io.ByteArrayOutputStream()
    cut.write(good, 0, keep)
    cut.write(good, endAt, good.length - endAt)
    val r = BinaryDispatch.safeDecode(cut.toByteArray)
    assert(r.status == "error", r.toString)
  }

  test("unrecognized containers error out instead of decoding raw " +
    "bytes as UTF-8 mojibake 'text'") {
    // a valid CFB holding no WordDocument/Workbook stream (a .ppt-like)
    val cfb = DocSynth.cfb(Seq("PowerPoint Document" -> new Array[Byte](4096)))
    val rCfb = BinaryDispatch.safeDecode(cfb)
    assert(rCfb.format == "cfb" && rCfb.status == "error" &&
      rCfb.error == "UnsupportedContainerException", rCfb.toString)
    // a valid zip holding no OOXML parts (a generic archive)
    val zip = OoxmlSynth.zip(Seq("readme.txt" -> "hello"))
    val rZip = BinaryDispatch.safeDecode(zip)
    assert(rZip.format == "zip" && rZip.status == "error" &&
      rZip.error == "UnsupportedContainerException", rZip.toString)
    // the raw dispatch throws the typed exception
    intercept[BinaryDispatch.UnsupportedContainerException] {
      BinaryDispatch.decode(cfb)
    }
  }

  test("cyclic DIFAT chain terminates with an error, not a spin") {
    // hand-build a 1024-byte CFB whose header declares a DIFAT sector
    // at sector 0 pointing back to itself
    val b = new Array[Byte](1024)
    val magic =
      Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
    System.arraycopy(magic, 0, b, 0, 8)
    def put16(off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def put32(off: Int, v: Int): Unit = {
      var i = 0
      while (i < 4) { b(off + i) = ((v >> (8 * i)) & 0xFF).toByte; i += 1 }
    }
    put16(0x1E, 9) // 512-byte sectors
    put16(0x20, 6) // 64-byte mini sectors
    put32(0x48, Int.MaxValue) // numDifatSectors: untrusted, huge
    put32(0x44, 0) // first DIFAT sector = sector 0
    java.util.Arrays.fill(b, 0x4C, 0x4C + 4 * 109, 0xFF.toByte) // header DIFAT free
    java.util.Arrays.fill(b, 512, 1024, 0xFF.toByte)
    put32(512 + 508, 0) // DIFAT next-pointer -> itself (the cycle)
    val t0 = System.nanoTime()
    intercept[IllegalArgumentException] { CfbDecode.streams(b) }
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "guard must fire fast")
  }
}
