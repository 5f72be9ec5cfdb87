package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("asset generation is deterministic and modality-typed") {
    val a = Multimodal.generate(spark, 30).collect().sortBy(_.asset_id)
    val b = Multimodal.generate(spark, 30).collect().sortBy(_.asset_id)
    assert(a.map(_.asset_id).toSeq == b.map(_.asset_id).toSeq)
    assert(a.zip(b).forall { case (x, y) => x.bytes.sameElements(y.bytes) })
    assert(a.map(_.meta.modality).toSet == Set("image", "audio", "video"))
  }

  test("feature extraction: batch shape, channel widths, determinism") {
    val assets = Multimodal.generate(spark, 60)
    val feats = Multimodal.extractFeatures(assets, 4).collect()
    assert(feats.length == 60)
    assert(feats.forall(_.error == null))
    val byMod = feats.groupBy(_.modality)
    assert(byMod("image").forall(_.features.length == 3))
    assert(byMod("audio").forall(_.features.length == 4))
    assert(byMod("video").forall(_.features.length == 8))
    val again = Multimodal.extractFeatures(assets, 7).collect()
      .map(f => f.asset_id -> f.checksum).toMap
    assert(feats.forall(f => again(f.asset_id) == f.checksum))
  }

  test("decode parallelism spreads past the 3 modality values") {
    // VERDICT r01 #5: keying on modality alone collapsed the stage to
    // <=3 non-empty partitions; the (modality, id-hash) key must spread
    import spark.implicits._
    val assets = Multimodal.generate(spark, 200)
    val nonEmpty = Multimodal.extractFeatures(assets, 16)
      .mapPartitions(it => Iterator.single(if (it.hasNext) 1 else 0))
      .collect().sum
    assert(nonEmpty > 3, s"only $nonEmpty non-empty partitions")
  }

  test("REAL image codec: PNG round-trip recovers the exact pixel " +
    "formula; resize produces a decodable image of the target size") {
    val id = 7L
    val (w, h, r, g, b) = Multimodal.decodeImage(Multimodal.pngBytes(id))
    assert(w == 8 && h == 8)
    // closed-form means from the pixel formula (PNG is lossless)
    def mean(f: (Int, Int) => Long): Double =
      (for (x <- 0 until 8; y <- 0 until 8)
        yield Math.floorMod(f(x, y), 256L).toDouble).sum / 64.0 / 255.0
    assert(math.abs(r - mean((x, y) => id * 17 + x * 3 + y * 5)) < 1e-12)
    assert(math.abs(g - mean((x, y) => id * 29 + x * 7 + y * 11)) < 1e-12)
    assert(math.abs(b - mean((x, y) => id * 43 + x * 13 + y * 17)) < 1e-12)
    val resized = Multimodal.resizeImage(Multimodal.pngBytes(id), 4, 4)
    val (w2, h2, _, _, _) = Multimodal.decodeImage(resized)
    assert(w2 == 4 && h2 == 4)
  }

  test("REAL wav codec: RIFF parse recovers rate, count and mean " +
    "amplitude; junk chunks skipped; non-PCM rejected") {
    val id = 3L
    val (rate, n, meanAbs) = Multimodal.decodeWavPcm16(Multimodal.wavBytes(id))
    assert(rate == 16000 && n == 800 + (id % 5) * 160)
    val expected = (0 until n).map(t =>
      math.abs(Math.floorMod(id * 31 + t * 7, 2003L) - 1001L).toDouble)
      .sum / n / 32768.0
    assert(math.abs(meanAbs - expected) < 1e-12)
    intercept[IllegalArgumentException] {
      Multimodal.decodeWavPcm16("RIFFxxxxWAVEnope".getBytes)
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeWavPcm16("not audio at all".getBytes)
    }
  }

  test("wav chunk walk is total: a 0xFFFFFFF8 chunk length (zero-advance " +
    "crafted file) errors instead of spinning, as do truncations/flips") {
    // the crafted hang: len = -8 as Int made `off += 8 + len + (len&1)`
    // advance by zero forever; must throw fast now
    val crafted = new java.io.ByteArrayOutputStream()
    crafted.write("RIFF".getBytes); crafted.write(Array[Byte](56, 0, 0, 0))
    crafted.write("WAVE".getBytes)
    crafted.write("junk".getBytes)
    crafted.write(Array[Byte](0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte))
    crafted.write(new Array[Byte](44)) // pad to 64 bytes
    val t0 = System.nanoTime()
    intercept[IllegalArgumentException] {
      Multimodal.decodeWavPcm16(crafted.toByteArray)
    }
    assert((System.nanoTime() - t0) / 1e9 < 2.0, "guard must fire fast")
    // odd-length 0xFFFFFFF7 variant (pad byte also zero-advances)
    val crafted2 = crafted.toByteArray.clone()
    crafted2(16) = 0xF7.toByte
    intercept[IllegalArgumentException] {
      Multimodal.decodeWavPcm16(crafted2)
    }
    // truncation + seeded bit-flip sweeps: throw-or-return, never hang
    val base = Multimodal.wavBytes(3L)
    val stride = math.max(1, base.length / 61)
    var len = 0
    while (len <= base.length) {
      try Multimodal.decodeWavPcm16(java.util.Arrays.copyOf(base, len))
      catch { case _: IllegalArgumentException | _: IndexOutOfBoundsException => }
      len += stride
    }
    val rnd = new scala.util.Random(
      sys.env.getOrElse("FUZZ_SEED", "42").toLong)
    for (_ <- 0 until sys.env.getOrElse("FUZZ_TRIALS", "60").toInt) {
      val b = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(8)) {
        val at = rnd.nextInt(b.length)
        b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
      }
      try Multimodal.decodeWavPcm16(b)
      catch { case _: IllegalArgumentException | _: IndexOutOfBoundsException => }
    }
  }

  test("extractFeaturesReal: real codecs per modality, error capture " +
    "on undecodable bytes") {
    import spark.implicits._
    val assets = Seq(
      Multimodal.MediaAsset(1L, Multimodal.pngBytes(1),
        Multimodal.MediaMeta("image", "image/png", 8, 8, -1, -1L)),
      Multimodal.MediaAsset(2L, Multimodal.wavBytes(2),
        Multimodal.MediaMeta("audio", "audio/wav", -1, -1, 16000, 100L)),
      Multimodal.MediaAsset(3L, Array[Byte](1, 2, 3),
        Multimodal.MediaMeta("image", "image/png", 8, 8, -1, -1L)))
    val out = Multimodal.extractFeaturesReal(spark.createDataset(assets), 4)
      .collect().sortBy(_.asset_id)
    assert(out(0).error == null && out(0).features.length == 5 &&
      out(0).features(0) == 8f)
    assert(out(1).error == null && out(1).features.length == 3 &&
      out(1).features(0) == 16000f)
    assert(out(2).error != null, "garbage image bytes must yield an error row")
  }

  test("frame sampling windows") {
    val bytes = Array.tabulate[Byte](100)(_.toByte)
    val frames = Multimodal.frameSample(bytes, 10, 3)
    assert(frames.size == 4) // windows 0,3,6,9
    assert(frames.head.toSeq == (0 until 10).map(_.toByte))
    assert(Multimodal.frameSample(null, 10, 3).isEmpty)
  }
}
