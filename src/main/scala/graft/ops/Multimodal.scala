package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract /
  * resize / frame-sample run as partition-batched transforms.
  *
  * The container ships no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB ([[StubCodec]]) — the Spark-side
  * contract (schema, batching, partition sizing, null/corrupt handling) is
  * real and tested, and swapping in a true codec is a one-function change.
  * On a Python-capable cluster the same shape runs as `mapInPandas` with
  * identical schemas.
  */
object Multimodal {

  /** Typed row for a multimodal asset: payload + metadata. */
  final case class Asset(
      asset_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  final case class AssetFeatures(
      asset_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float])

  /** STUB decode kernel — deterministic fake standing in for a real codec.
    * Real implementation would be e.g. javax.imageio / ffmpeg here, or a
    * `mapInPandas` Pandas UDF (PIL/torchaudio) on a full cluster:
    * the feature is a seeded projection of payload bytes, NOT real pixels.
    */
  object StubCodec {
    val FeatureDim = 8
    def decodeAndEmbed(payload: Array[Byte]): Array[Float] = {
      // ??? <- real codec goes here; deterministic fake below keeps the
      // pipeline testable end-to-end without image/audio libraries.
      val out = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        out(i % FeatureDim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      out
    }
    def checksum(payload: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + (payload(i) & 0xFF); i += 1 }
      h
    }
  }

  /** Decode + featurize, batched per partition (the mapInPandas shape:
    * iterator-of-batches in, iterator-of-batches out; no per-row object
    * churn beyond the unavoidable case-class rows).
    */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        AssetFeatures(
          a.asset_id, a.kind, a.payload.length.toLong,
          StubCodec.checksum(a.payload),
          StubCodec.decodeAndEmbed(a.payload))
      }
    }
  }

  /** Frame sampling plan for video: pick every `stride`-th frame index —
    * pure column math so the (expensive) decode only touches sampled frames.
    */
  def sampleFrameIndexes(df: DataFrame, nFramesCol: String, stride: Int): DataFrame =
    df.withColumn(
      "sampled_frames",
      filter(sequence(lit(0), col(nFramesCol) - 1), i => i % stride === 0))

  /** Deterministic synthetic asset table for tests (no external data). */
  def syntheticAssets(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val rnd = new scala.util.Random(seed + id)
      val kind = Seq("image", "audio", "video")(
        (id % 3).toInt)
      val payload = Array.fill((rnd.nextInt(512) + 32))(rnd.nextInt(256).toByte)
      Asset(id, kind, payload, 64, 64, 16000, 30)
    }
  }
}
