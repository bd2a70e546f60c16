package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed metadata carried beside every opaque media blob. */
final case class MediaMeta(
    mediaType: String, // image | audio | video
    width: Int,
    height: Int,
    durationMs: Long,
    codec: String)

final case class MediaRow(media_id: Long, content: Array[Byte], meta: MediaMeta)

final case class ImageFeatures(
    media_id: Long,
    width: Int,
    height: Int,
    n_bytes: Int,
    checksum: Long,
    features: Array[Float])

final case class FrameSample(media_id: Long, frame_index: Int, offset_ms: Long)

/** Multimodal columns (SURVEY.md §2.11 X5): image/audio/video as opaque
  * `binary` columns with a typed metadata struct, processed in BATCHES
  * inside `mapPartitions` — the Scala shape of `mapInPandas`: one iterator
  * per partition, grouped into fixed-size batches so a real codec could
  * amortize model/library setup per batch instead of per row.
  *
  * The decode step itself is a STUB (image/audio libraries are not in this
  * container): [[decodeImageStub]] produces deterministic fake dimensions +
  * features from the bytes. The Spark-side plumbing — schema, batching,
  * partition sizing — is real and tested; swapping the stub for a codec
  * changes nothing structural.
  *
  * Scale notes: blobs never pass through a shuffle (all transforms are
  * map-side); partition budgets are byte-based (use
  * `spark.sql.files.maxPartitionBytes` on read so one task holds a bounded
  * number of blobs), and feature extraction emits small fixed-width rows,
  * so the heavy binary column is dropped as early as possible.
  */
object Multimodal {

  /** STUB — deterministic fake decode standing in for an image codec.
    * "Decodes" dimensions and a tiny feature vector purely from the bytes,
    * so tests are reproducible without any native library. */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val checksum = bytes.foldLeft(1469598103934665603L)((h, b) =>
      (h ^ b) * 1099511628211L) // FNV-1a, deterministic
    val w = 64 + math.floorMod(checksum, 512).toInt
    val h = 64 + math.floorMod(checksum >> 16, 512).toInt
    val feats = Array.tabulate(8)(i =>
      math.floorMod(checksum >> (8 * (i % 8)), 1000).toFloat / 1000f)
    (w, h, feats)
  }

  private def fnv(bytes: Array[Byte]): Long =
    bytes.foldLeft(1469598103934665603L)((h, b) => (h ^ b) * 1099511628211L)

  /** Batched feature extraction — the mapInPandas shape: per-partition
    * iterator, grouped into `batchSize` chunks; a real implementation would
    * initialize the codec once per batch (or partition) here. */
  def extractImageFeatures(media: Dataset[MediaRow], batchSize: Int = 32)
      : Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (codec / model handle)
        batch.iterator.map { row =>
          val (w, h, feats) = decodeImageStub(row.content)
          ImageFeatures(row.media_id, w, h, row.content.length,
            fnv(row.content), feats)
        }
      }
    }
  }

  /** Video frame sampling STUB: emits every `everyMs`-th frame offset from
    * the metadata duration — the explode-shaped transform (1 row -> k
    * rows) a real frame sampler would produce. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 1000L)
      : Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.mediaType == "video").flatMap { row =>
      (0L until math.max(row.meta.durationMs, 1L) by everyMs)
        .zipWithIndex
        .map { case (off, i) => FrameSample(row.media_id, i, off) }
    }
  }

  /** "Resize" STUB as a metadata transform: clamps stored dimensions to a
    * bounding box, preserving aspect ratio — pure column math, the real
    * pixel work would live in the batched extractor. */
  def resizeMeta(df: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(
      lit(maxDim) / greatest(col("meta.width"), lit(1)),
      lit(maxDim) / greatest(col("meta.height"), lit(1)),
      lit(1.0))
    df.withColumn("resized_width",
        ceil(col("meta.width") * scale).cast("int"))
      .withColumn("resized_height",
        ceil(col("meta.height") * scale).cast("int"))
  }
}
