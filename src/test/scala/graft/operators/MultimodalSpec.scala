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

  test("frame sampling windows") {
    val bytes = Array.tabulate[Byte](100)(_.toByte)
    val frames = Multimodal.frameSample(bytes, 10, 3)
    assert(frames.size == 4) // windows 0,3,6,9
    assert(frames.head.toSeq == (0 until 10).map(_.toByte))
    assert(Multimodal.frameSample(null, 10, 3).isEmpty)
  }
}
