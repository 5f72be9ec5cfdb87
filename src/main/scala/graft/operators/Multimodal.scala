package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata, processed in partition-sized batches.
  *
  * The Spark-side plumbing (schema, partitioning by modality, batch
  * shape, error capture) is real and tested; the codec step is a
  * clearly-marked deterministic STUB — no image/audio libraries exist in
  * this sandbox (builder prompt). Swapping `decodeStub` for a real codec
  * (javacv / a Pandas UDF in PySpark) changes nothing upstream of the
  * decode call.
  */
object Multimodal {

  /** Asset row: media bytes + typed metadata, the at-rest schema. */
  final case class MediaMeta(
      modality: String,   // "image" | "audio" | "video"
      mimeType: String,
      width: Int,         // -1 when n/a
      height: Int,        // -1 when n/a
      sampleRateHz: Int,  // -1 when n/a
      durationMs: Long)   // -1 when n/a
  final case class MediaAsset(asset_id: Long, bytes: Array[Byte],
                              meta: MediaMeta)

  /** Extracted features per asset (fixed-width, columnar-friendly). */
  final case class MediaFeatures(
      asset_id: Long,
      modality: String,
      nBytes: Long,
      checksum: Long,
      // image: mean "pixel" per channel; audio: band energies; video:
      // per-sampled-frame means — all from the stubbed decode
      features: Array[Float],
      error: String)

  /** STUB codec ??? — deterministic fake decode: hashes fixed-size byte
    * windows into "channel" statistics. Real codecs drop in here; the
    * batch shape, schema and partitioning stay identical.
    */
  def decodeStub(bytes: Array[Byte], meta: MediaMeta): Array[Float] = {
    val channels = meta.modality match {
      case "image" => 3
      case "audio" => 4
      case "video" => 8
      case _ => 1
    }
    val out = new Array[Float](channels)
    if (bytes == null || bytes.isEmpty) return out
    var i = 0
    while (i < bytes.length) {
      out(i % channels) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    var c = 0
    while (c < channels) {
      out(c) = out(c) / math.max(1, bytes.length / channels)
      c += 1
    }
    out
  }

  /** Deterministic frame sampling for video bytes: every k-th window —
    * the real pipeline samples frames; the byte windows stand in.
    */
  def frameSample(bytes: Array[Byte], frameBytes: Int, everyK: Int): Seq[Array[Byte]] = {
    if (bytes == null || frameBytes <= 0 || everyK <= 0) return Nil
    val frames = bytes.grouped(frameBytes).zipWithIndex
      .collect { case (f, i) if i % everyK == 0 => f }
    frames.toSeq
  }

  private def checksum(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xff; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** The distributed transform: repartition by (modality, asset-id hash)
    * — modality keeps codec working sets together (image decoders batch
    * with image decoders) while the id-hash term spreads each modality
    * over all `partitions` tasks (keying on modality alone collapses
    * parallelism to the 3 distinct values). One serde boundary, no
    * driver loop.
    */
  def extractFeatures(assets: Dataset[MediaAsset],
                      partitions: Int): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets
      .repartition(partitions, col("meta.modality"),
        pmod(xxhash64(col("asset_id")), lit(partitions)))
      .mapPartitions(_.map { a =>
        try {
          val feats = decodeStub(a.bytes, a.meta)
          MediaFeatures(a.asset_id, a.meta.modality,
            if (a.bytes == null) 0L else a.bytes.length.toLong,
            if (a.bytes == null) 0L else checksum(a.bytes), feats, null)
        } catch {
          case e: Exception =>
            MediaFeatures(a.asset_id, a.meta.modality, 0L, 0L,
              Array.empty[Float], s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      })
  }

  /** Deterministic synthetic asset table (tests/bench; no external data).
    * Byte LENGTH is a closed-form function of id (SQL-reproducible, so
    * the q29 byte-metric aggregation has a DuckDB oracle); byte CONTENT
    * stays seeded-random.
    */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaAsset] = {
    import spark.implicits._
    val modalities = Array("image", "audio", "video")
    spark.range(n).map { id =>
      val rnd = new scala.util.Random(seed ^ (id * 0x9e3779b97f4a7c15L))
      val modality = modalities((id % 3).toInt)
      // floorMod: the product overflows Long past id ~3.47e9, where a
      // sign-following % would yield a negative length (ADVICE r02)
      val len = (256 + Math.floorMod(id * 2654435761L, 1024L)).toInt
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      val meta = modality match {
        case "image" => MediaMeta("image", "image/png", 64, 64, -1, -1L)
        case "audio" => MediaMeta("audio", "audio/wav", -1, -1, 16000, 2000L)
        case _ => MediaMeta("video", "video/mp4", 320, 240, -1, 5000L)
      }
      MediaAsset(id, bytes, meta)
    }
  }
}
