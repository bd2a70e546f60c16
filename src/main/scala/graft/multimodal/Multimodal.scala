package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

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

/** Header-level image info decoded from the blob itself (not the declared
  * metadata — production pipelines trust the bytes, not the catalog). */
final case class ImageInfo(width: Int, height: Int, channels: Int,
    format: String)

final case class ImageFeatures(
    media_id: Long,
    decode_ok: Boolean,
    width: Int,
    height: Int,
    channels: Int,
    format: String,
    n_bytes: Int,
    checksum: Long,
    features: Array[Float])

final case class FrameSample(media_id: Long, frame_index: Int, offset_ms: Long)

final case class ResizedImage(
    media_id: Long,
    decode_ok: Boolean,
    width: Int,
    height: Int,
    content: Array[Byte])

/** Multimodal columns (SURVEY.md §2.11 X5): image/audio/video as opaque
  * `binary` columns with a typed metadata struct, processed in BATCHES
  * inside `mapPartitions` — the Scala shape of `mapInPandas`: one iterator
  * per partition, grouped into fixed-size batches so a codec can amortize
  * setup per batch instead of per row.
  *
  * Image decode is REAL: the JDK's `javax.imageio` reads PNG/JPEG/GIF/BMP
  * with no external codec — [[sniffImage]] pulls width/height/channels/
  * format from the HEADER only (cheap, the 100 TB triage pass), and
  * [[extractImageFeatures]] fully decodes to pixel statistics (mean RGB,
  * luma, quadrant lumas — a deterministic stand-in embedding). Undecodable
  * blobs surface as `decode_ok = false` rows — corrupt media is data to
  * quarantine, not an exception to throw. AUDIO decode is real too
  * ([[extractAudioFeatures]]: WAV/AIFF/AU via `javax.sound.sampled` —
  * header facts + RMS/peak/zero-cross from the PCM samples), as is
  * multi-frame decode for animated GIF ([[sampleAnimationFrames]] — the
  * one multi-frame container with a JDK codec); for mp4/webm/mp3 the JDK
  * ships no codec, so [[sampleFrames]] plans frame offsets from metadata
  * for an external decoder to consume (the honest remaining limitation).
  *
  * Scale notes: blobs never pass through a shuffle (all transforms are
  * map-side); partition budgets are byte-based (use
  * `spark.sql.files.maxPartitionBytes` on read so one task holds a bounded
  * number of blobs), and feature extraction emits small fixed-width rows,
  * so the heavy binary column is dropped as early as possible. Prefer
  * [[sniffImage]] when only dimensions are needed — it reads the header,
  * not the pixels.
  */
object Multimodal {

  private def fnv(bytes: Array[Byte]): Long =
    bytes.foldLeft(1469598103934665603L)((h, b) => (h ^ b) * 1099511628211L)

  /** HEADER-ONLY image decode via `javax.imageio`: width, height, channel
    * count, and container format without decoding pixel data — the shape a
    * 100 TB media-triage scan wants (bounded work per blob regardless of
    * image size). Returns None for bytes no installed reader recognizes. */
  def sniffImage(bytes: Array[Byte]): Option[ImageInfo] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        r.setInput(iis, true, true)
        try {
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          val types = r.getImageTypes(0)
          val channels =
            if (types.hasNext) types.next().getColorModel.getNumComponents
            else -1
          Some(ImageInfo(w, h, channels, r.getFormatName.toLowerCase))
        } finally r.dispose()
      }
    } catch {
      case _: java.io.IOException => None
    } finally iis.close()
  }

  /** Full pixel decode to a deterministic 8-float feature vector: mean R,
    * G, B, global luma, and per-quadrant luma (all in [0,1]) — real pixel
    * statistics standing where a learned embedding would plug in. */
  def pixelFeatures(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    val quad = new Array[Double](4)
    val quadN = new Array[Long](4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sr += r; sg += g; sb += b
        val luma = 0.299 * r + 0.587 * g + 0.114 * b
        val q = (if (y >= h / 2) 2 else 0) + (if (x >= w / 2) 1 else 0)
        quad(q) += luma
        quadN(q) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Array(
      (sr / n / 255.0).toFloat,
      (sg / n / 255.0).toFloat,
      (sb / n / 255.0).toFloat,
      ((0.299 * sr + 0.587 * sg + 0.114 * sb) / n / 255.0).toFloat,
      (quad(0) / math.max(quadN(0), 1L) / 255.0).toFloat,
      (quad(1) / math.max(quadN(1), 1L) / 255.0).toFloat,
      (quad(2) / math.max(quadN(2), 1L) / 255.0).toFloat,
      (quad(3) / math.max(quadN(3), 1L) / 255.0).toFloat)
  }

  /** Batched feature extraction — the mapInPandas shape: per-partition
    * iterator, grouped into `batchSize` chunks (a learned model would
    * initialize once per batch here). Each blob is REALLY decoded with
    * `javax.imageio`; undecodable bytes yield a `decode_ok = false` row
    * with header fields zeroed-out and an all-zero feature vector, so
    * corrupt media flows to a quarantine filter instead of failing the
    * job. */
  def extractImageFeatures(media: Dataset[MediaRow], batchSize: Int = 32)
      : Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (model handle / scratch buffers)
        batch.iterator.map { row =>
          val info = sniffImage(row.content)
          val img = info.flatMap { _ =>
            // NonFatal: see resizeImages — plugin RuntimeExceptions on
            // corrupt bodies must quarantine, not kill the job
            try Option(ImageIO.read(new ByteArrayInputStream(row.content)))
            catch { case scala.util.control.NonFatal(_) => None }
          }
          (info, img) match {
            case (Some(i), Some(bi)) =>
              ImageFeatures(row.media_id, decode_ok = true,
                i.width, i.height, i.channels, i.format,
                row.content.length, fnv(row.content), pixelFeatures(bi))
            case _ =>
              ImageFeatures(row.media_id, decode_ok = false,
                -1, -1, -1, "", row.content.length, fnv(row.content),
                new Array[Float](8))
          }
        }
      }
    }
  }

  /** Header-only triage over a media table: one row per blob with the
    * SNIFFED dimensions beside the declared metadata — the first pass a
    * media pipeline runs (catalog-vs-bytes drift, corrupt-blob rate)
    * before paying for pixel decode. */
  def sniffImages(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.map { row =>
      val info = sniffImage(row.content)
      (row.media_id, row.meta.mediaType, row.meta.width, row.meta.height,
        info.isDefined, info.map(_.width).getOrElse(-1),
        info.map(_.height).getOrElse(-1),
        info.map(_.channels).getOrElse(-1),
        info.map(_.format).getOrElse(""))
    }.toDF("media_id", "declared_type", "declared_width", "declared_height",
      "decode_ok", "width", "height", "channels", "format")
  }

  /** REAL audio decode to signal features via `javax.sound.sampled` (the
    * JDK ships WAV/AIFF/AU codecs — the audio sibling of the imageio
    * paths): container facts from the header (sample rate, channels, bit
    * depth, frame count -> duration) and per-blob PCM statistics from
    * the samples — RMS energy, peak amplitude, zero-crossing rate, all
    * normalized to [-1,1] sample space — the deterministic stand-in for
    * a learned audio embedding, and the triage stats (silence/clipping
    * detection) a 100 TB audio pipeline filters on before any model.
    * Channels are averaged (mono mix) before statistics. Compressed
    * formats (mp3/ogg — no JDK codec) and corrupt blobs quarantine as
    * `decode_ok = false` rows. Map-side only, blob dropped at output. */
  def extractAudioFeatures(media: Dataset[MediaRow], batchSize: Int = 32)
      : DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val decoded = try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(row.content))
            try {
              val fmt = in.getFormat
              val bits = fmt.getSampleSizeInBits
              val ch = fmt.getChannels
              // restrict to the PCM encodings we can normalize exactly
              val enc = fmt.getEncoding.toString
              if (bits != 8 && bits != 16) None
              else if (enc != "PCM_SIGNED" && enc != "PCM_UNSIGNED") None
              else {
                val bytes = in.readAllBytes()
                val bytesPerFrame = fmt.getFrameSize
                val n = bytes.length / bytesPerFrame
                val big = fmt.isBigEndian
                val full = (1 << (bits - 1)).toDouble
                var sumSq = 0.0
                var peak = 0.0
                var crossings = 0L
                var prevSign = 0
                var f = 0
                while (f < n) {
                  var mix = 0.0
                  var c = 0
                  while (c < ch) {
                    val off = f * bytesPerFrame + c * (bits / 8)
                    val raw =
                      if (bits == 8) {
                        val b = bytes(off).toInt
                        if (enc == "PCM_UNSIGNED") (b & 0xff) - 128 else b
                      } else {
                        val (b0, b1) =
                          if (big) (bytes(off), bytes(off + 1))
                          else (bytes(off + 1), bytes(off))
                        val v = (b0 << 8) | (b1 & 0xff)
                        if (enc == "PCM_UNSIGNED") (v & 0xffff) - 32768
                        else v
                      }
                    mix += raw / full
                    c += 1
                  }
                  mix /= ch
                  sumSq += mix * mix
                  if (math.abs(mix) > peak) peak = math.abs(mix)
                  val sign = if (mix > 0) 1 else if (mix < 0) -1 else 0
                  if (sign != 0 && prevSign != 0 && sign != prevSign)
                    crossings += 1
                  if (sign != 0) prevSign = sign
                  f += 1
                }
                Some((fmt.getSampleRate.toInt, ch, bits, n.toLong,
                  if (n == 0) 0.0 else math.sqrt(sumSq / n), peak,
                  if (n <= 1) 0.0 else crossings.toDouble / (n - 1)))
              }
            } finally in.close()
          } catch { case scala.util.control.NonFatal(_) => None }
          decoded match {
            case Some((sr, ch, bits, n, rms, peak, zcr)) =>
              (row.media_id, true, sr, ch, bits, n,
                math.rint(n.toDouble / math.max(sr, 1) * 1000).toLong,
                math.rint(rms * 1e6) / 1e6, math.rint(peak * 1e6) / 1e6,
                math.rint(zcr * 1e6) / 1e6)
            case None =>
              (row.media_id, false, -1, -1, -1, -1L, -1L, -1.0, -1.0, -1.0)
          }
        }
      }
    }.toDF("media_id", "decode_ok", "sample_rate", "channels", "bits",
      "n_frames", "duration_ms", "rms", "peak", "zero_cross_rate")
  }

  /** Frame-offset PLANNER for container formats the JDK cannot decode
    * (mp4/webm — no JDK codec): emits every `everyMs`-th frame offset
    * from the metadata duration, the explode-shaped transform (1 row ->
    * k rows) a decoder plugs into. For MULTI-FRAME formats the JDK does
    * ship a codec for (animated GIF), [[sampleAnimationFrames]] is the
    * REAL decode path. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 1000L)
      : Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.mediaType == "video").flatMap { row =>
      (0L until math.max(row.meta.durationMs, 1L) by everyMs)
        .zipWithIndex
        .map { case (off, i) => FrameSample(row.media_id, i, off) }
    }
  }

  /** REAL multi-frame decode + sampling over animated GIF blobs (the one
    * multi-frame container the JDK ships a codec for): every `everyNth`
    * frame is decoded to pixel statistics — frame count from the
    * container, per-frame width/height/mean-luma from the pixels, the
    * 1-row -> k-rows explode a video pipeline's frame sampler performs,
    * with the decoder amortized per blob. Rows whose bytes are not
    * animated GIF (wrong magic, corrupt body, single-frame) yield ONE
    * `decode_ok = false` quarantine row, never a task failure. Frames
    * are decoded AS STORED (GIF delta frames may be smaller than the
    * logical screen; compositing deltas onto the canvas is a renderer
    * concern, not a sampling one). Same scale shape as every transform
    * here: map-side only, blob dropped at output, fixed-width rows. */
  def sampleAnimationFrames(media: Dataset[MediaRow], everyNth: Int = 1)
      : DataFrame = {
    import media.sparkSession.implicits._
    val step = math.max(everyNth, 1)
    media.mapPartitions { it =>
      it.flatMap { row =>
        val isGif = row.content.length > 6 &&
          row.content(0) == 'G' && row.content(1) == 'I' &&
          row.content(2) == 'F'
        val frames: Seq[(Int, Int, Int, Int, Double)] =
          if (!isGif) Nil
          else {
            val readers = ImageIO.getImageReadersByFormatName("gif")
            if (!readers.hasNext) Nil
            else {
              val reader = readers.next()
              try {
                reader.setInput(ImageIO.createImageInputStream(
                  new ByteArrayInputStream(row.content)))
                val n = reader.getNumImages(true)
                if (n < 2) Nil // not an animation
                else (0 until n by step).map { i =>
                  val img = reader.read(i)
                  var luma = 0.0
                  val (w, h) = (img.getWidth, img.getHeight)
                  var y = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      val p = img.getRGB(x, y)
                      luma += (0.299 * ((p >> 16) & 0xff) +
                        0.587 * ((p >> 8) & 0xff) +
                        0.114 * (p & 0xff)) / 255.0
                      x += 1
                    }
                    y += 1
                  }
                  (i, n, w, h, luma / math.max(w * h, 1))
                }
              } catch { case scala.util.control.NonFatal(_) => Nil }
              finally reader.dispose()
            }
          }
        if (frames.isEmpty)
          Seq((row.media_id, false, -1, -1, -1, -1, -1.0))
        else frames.map { case (i, n, w, h, luma) =>
          (row.media_id, true, i, n, w, h,
            math.rint(luma * 1e6) / 1e6)
        }
      }
    }.toDF("media_id", "decode_ok", "frame_index", "n_frames",
      "width", "height", "mean_luma")
  }

  /** REAL pixel resample into a `maxDim` bounding box (aspect preserved,
    * never upscaled): bilinear via `java.awt.Graphics2D`, re-encoded as
    * PNG with the JDK's own writer — no external codec, and PNG is
    * lossless so the output bytes are a deterministic function of the
    * input. Batched like [[extractImageFeatures]] (the mapInPandas
    * shape); undecodable blobs become `decode_ok = false` quarantine rows.
    * Images already inside the box pass their ORIGINAL bytes through
    * untouched (no decode-reencode churn on the common case). Target
    * dimensions follow [[resizeMeta]]'s ceil math exactly, so the column
    * planner and the pixel path can never disagree about output shape. */
  def resizeImages(media: Dataset[MediaRow], maxDim: Int, batchSize: Int = 32)
      : Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val img =
            // NonFatal, not just IOException: ImageIO plugins throw
            // RuntimeExceptions (CMMException, IndexOutOfBounds…) on
            // corrupt bodies with valid magic — any of them must become
            // a quarantine row, never a task failure (found by review)
            try Option(ImageIO.read(new ByteArrayInputStream(row.content)))
            catch { case scala.util.control.NonFatal(_) => None }
          img match {
            case Some(src) if math.max(src.getWidth, src.getHeight) <= maxDim =>
              ResizedImage(row.media_id, decode_ok = true,
                src.getWidth, src.getHeight, row.content)
            case Some(src) =>
              val scale =
                maxDim.toDouble / math.max(math.max(src.getWidth, src.getHeight), 1)
              // clamp to the box: fl(maxDim/d)*d can round a hair ABOVE
              // maxDim (e.g. 7*fl(5/7) = 5.000000000000001 -> ceil 6), so
              // ceil alone may overshoot by 1 px (ADVICE r6)
              val w = math.min(maxDim,
                math.max(1, math.ceil(src.getWidth * scale).toInt))
              val h = math.min(maxDim,
                math.max(1, math.ceil(src.getHeight * scale).toInt))
              // preserve alpha: drawing a transparent PNG onto an
              // opaque (zero-initialized = black) raster would burn the
              // background in (found by review)
              val imgType =
                if (src.getColorModel.hasAlpha)
                  java.awt.image.BufferedImage.TYPE_INT_ARGB
                else java.awt.image.BufferedImage.TYPE_INT_RGB
              val dst = new java.awt.image.BufferedImage(w, h, imgType)
              val g = dst.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(src, 0, 0, w, h, null)
              } finally g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              ImageIO.write(dst, "png", bos)
              ResizedImage(row.media_id, decode_ok = true, w, h,
                bos.toByteArray)
            case None =>
              ResizedImage(row.media_id, decode_ok = false, -1, -1,
                Array.emptyByteArray)
          }
        }
      }
    }
  }

  /** "Resize" as a metadata transform: clamps stored dimensions to a
    * bounding box, preserving aspect ratio — pure column math; the pixel
    * resample itself lives in [[resizeImages]]. */
  def resizeMeta(df: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(
      lit(maxDim) / greatest(col("meta.width"), lit(1)),
      lit(maxDim) / greatest(col("meta.height"), lit(1)),
      lit(1.0))
    // same clamp as [[resizeImages]] (ADVICE r6): ceil of a rounded-up
    // scale product can overshoot the box by 1 px
    df.withColumn("resized_width",
        least(lit(maxDim), ceil(col("meta.width") * scale).cast("int")))
      .withColumn("resized_height",
        least(lit(maxDim), ceil(col("meta.height") * scale).cast("int")))
  }
}
