package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract /
  * resize / frame-sample run as partition-batched transforms.
  *
  * The image path is REAL: payloads are PNG bytes decoded with the JDK's
  * `javax.imageio` (no external deps), and the feature vector is derived
  * from actual pixels (dimensions + per-channel means). Audio/video remain
  * clearly-marked deterministic STUBS ([[StubCodec]]) — the container ships
  * no audio/video codecs — with the Spark-side contract (schema, batching,
  * partition sizing, null/corrupt handling) identical across kinds. On a
  * Python-capable cluster the same shape runs as `mapInPandas` with
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

  /** Real image codec: PNG/JPEG decode via `javax.imageio` (JDK-native).
    * Feature = [width, height, mean_R, mean_G, mean_B] over the decoded
    * pixel grid (means in [0,1]). PNG is lossless, so the feature is exactly
    * reproducible from the original pixel data. Corrupt/undecodable payloads
    * yield an empty feature (the null-handling contract of the pipeline).
    */
  object ImageCodec {
    val FeatureDim = 5

    def decodeAndEmbed(payload: Array[Byte]): Array[Float] = {
      val img =
        try ImageIO.read(new ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (img == null) Array.empty[Float]
      else {
        val w = img.getWidth
        val h = img.getHeight
        var r = 0L; var g = 0L; var b = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h * 255).toFloat
        Array(w.toFloat, h.toFloat, r / n, g / n, b / n)
      }
    }

    /** Deterministic synthetic PNG: pixel (x,y) of asset `id` is a fixed
      * integer function, encoded through the real PNG writer — so decode is
      * exercised against genuine compressed image bytes.
      */
    def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
          val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
          val b = ((id * 5 + x * 13 + y * 29) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
  }

  /** STUB decode kernel for audio/video — deterministic fake standing in for
    * a real codec. Real implementation would be ffmpeg/torchaudio here (not
    * in this container), or a `mapInPandas` Pandas UDF on a full cluster:
    * the feature is a seeded projection of payload bytes, NOT real samples.
    */
  object StubCodec {
    val FeatureDim = 8
    def decodeAndEmbed(payload: Array[Byte]): Array[Float] = {
      // ??? <- real audio/video codec goes here; deterministic fake below
      // keeps the pipeline testable end-to-end without codec libraries.
      // Feature = strided byte histogram with INTEGER accumulation (each
      // bucket < 2^24, so the float32 values are exact) — bit-reproducible
      // in any engine, which is what lets the gate query carry an exact
      // DuckDB oracle for the stub rows.
      val out = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        out(i % FeatureDim) += (payload(i) & 0xFF)
        i += 1
      }
      out
    }
  }

  def checksum(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + (payload(i) & 0xFF); i += 1 }
    h
  }

  /** Decode + featurize, batched per partition (the mapInPandas shape:
    * iterator-of-batches in, iterator-of-batches out; no per-row object
    * churn beyond the unavoidable case-class rows). Images take the real
    * `javax.imageio` decode; audio/video take the stub kernel.
    */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        // null payload = corrupt/missing asset: empty features, zero-length
        // checksum — same contract as an undecodable image
        if (a.payload == null)
          AssetFeatures(a.asset_id, a.kind, 0L, checksum(Array.emptyByteArray),
            Array.empty[Float])
        else {
          val feat =
            if (a.kind == "image") ImageCodec.decodeAndEmbed(a.payload)
            else StubCodec.decodeAndEmbed(a.payload)
          AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong,
            checksum(a.payload), feat)
        }
      }
    }
  }

  /** Frame sampling plan for video: pick every `stride`-th frame index —
    * pure column math so the (expensive) decode only touches sampled frames.
    */
  def sampleFrameIndexes(df: DataFrame, nFramesCol: String, stride: Int): DataFrame =
    df.withColumn(
      "sampled_frames",
      // guard n_frames <= 0: sequence(0, -1) runs DESCENDING (step defaults
      // to -1 when start > stop), which would emit a phantom frame 0 for an
      // empty video instead of an empty list
      when(col(nFramesCol) > 0,
        filter(sequence(lit(0), col(nFramesCol) - 1), i => i % stride === 0))
        .otherwise(array().cast("array<int>")))

  /** Deterministic synthetic asset table for tests (no external data):
    * image rows carry REAL PNG bytes; audio/video carry formula-derived
    * opaque payloads (length 32 + (id·37 mod 512), byte i =
    * (id·131 + i·7) mod 256) for the stub path — pure modular arithmetic,
    * so the DuckDB gate recomputes the stub features exactly.
    */
  def syntheticAssets(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      if (kind == "image") {
        val w = 16 + (id % 16).toInt
        val h = 12 + (id % 8).toInt
        Asset(id, kind, ImageCodec.syntheticPng(id, w, h), w, h, 0, 1)
      } else {
        val len = 32 + ((id * 37) % 512).toInt
        val payload = Array.tabulate(len)(i => ((id * 131 + i * 7) % 256).toByte)
        Asset(id, kind, payload, 0, 0, 16000, 30)
      }
    }
  }
}
