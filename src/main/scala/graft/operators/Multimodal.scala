package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in fixed-size batches.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch shape, feature-vector output — while the actual media decode is a
  * STUB (this environment ships no image/audio codecs): `decodeStub`
  * derives deterministic pseudo-features from the bytes. Swapping in a real
  * decoder is a one-function change with the same `Iterator` shape a JNI or
  * process-per-partition decoder would use (the Scala analog of
  * `mapInPandas` batch processing).
  */
object Multimodal {

  /** One media asset: id + opaque payload + metadata. */
  final case class MediaRow(
      media_id: Long,
      payload: Array[Byte],
      mime: String,
      width: Int,
      height: Int)

  /** Extracted features: fixed-dim vector + decoded dimensions. */
  final case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Long,
      features: Array[Float])

  /** ??? real decoder goes here — STUB: deterministic byte-statistics
    * features so the full pipeline (schema → partition batches → feature
    * table) is exercised end-to-end without codecs. */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** Per-partition batched feature extraction. Batches bound peak memory
    * the way Arrow batches do on a Python `mapInPandas` path. */
  def extractFeatures(
      ds: Dataset[MediaRow],
      dim: Int = 16,
      batchSize: Int = 256
  ): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real decoder would decode `batch` as one unit (GPU/process call)
        batch.iterator.map { r =>
          MediaFeatures(r.media_id, r.mime, r.payload.length.toLong,
            decodeStub(r.payload, dim))
        }
      }
    }
  }

  /** ??? real resize goes here — STUB: "resizes" by deterministic byte
    * subsampling to `targetBytes`, preserving the batched per-partition
    * shape a real image-resize (JNI/codec) call would use. */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] =
    if (payload.length <= targetBytes) payload
    else {
      val out = new Array[Byte](targetBytes)
      val stride = payload.length.toDouble / targetBytes
      var i = 0
      while (i < targetBytes) {
        out(i) = payload((i * stride).toInt.min(payload.length - 1))
        i += 1
      }
      out
    }

  /** ??? real frame extraction goes here — STUB: samples `n` evenly-spaced
    * fixed-size "frames" from a video-like payload. Output is one row per
    * frame — the explode shape a real decoder produces. */
  def sampleFramesStub(payload: Array[Byte], n: Int, frameBytes: Int): Seq[Array[Byte]] =
    (0 until n).map { f =>
      val start = ((payload.length.max(1) - 1).toLong * f / n.max(1)).toInt
      payload.slice(start, (start + frameBytes).min(payload.length))
    }

  /** Resize pass over a media Dataset (batched mapPartitions, stub kernel). */
  def resize(ds: Dataset[MediaRow], targetBytes: Int, batchSize: Int = 256): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map(r =>
      r.copy(payload = resizeStub(r.payload, targetBytes)))))
  }

  /** Frame sampling: one output row per sampled frame, keyed by media_id. */
  def sampleFrames(
      ds: Dataset[MediaRow],
      framesPerAsset: Int,
      frameBytes: Int,
      batchSize: Int = 256
  ): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.iterator.flatMap { r =>
      sampleFramesStub(r.payload, framesPerAsset, frameBytes).zipWithIndex.map {
        case (frame, i) =>
          MediaRow(r.media_id * 1000 + i, frame, r.mime, r.width, r.height)
      }
    }))
  }

  /** Demo pipeline over the `documents` table: treat each document's bytes
    * as an opaque media payload, run the batched decode path, and emit a
    * features table. Proves the plumbing (binary column → typed Dataset →
    * mapPartitions batches → feature frame) on real data. */
  def documentBytesPipeline(spark: SparkSession, documents: DataFrame, dim: Int = 16): DataFrame = {
    import spark.implicits._
    val media = documents.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("mime"),
      lit(0).as("width"),
      lit(0).as("height")
    ).as[MediaRow]

    extractFeatures(media, dim)
      .toDF()
      .select(col("media_id"), col("mime"), col("n_bytes"),
        round(aggregate(col("features"),
          lit(0.0), (acc, x) => acc + x.cast("double")), 4).as("feature_sum"))
  }
}
