package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** A real encoded image: deterministic gradient, any JDK writer format. */
  private def image(w: Int, h: Int, fmt: String,
      argb: Boolean = false): Array[Byte] = {
    val t = if (argb) BufferedImage.TYPE_INT_ARGB else BufferedImage.TYPE_INT_RGB
    val img = new BufferedImage(w, h, t)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (0xff << 24) | ((x * 255 / w) << 16) |
        ((y * 255 / h) << 8) | ((x + y) % 256))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  private def junk(seed: Int, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((seed * 31 + i * 7) % 251).toByte)

  private lazy val png = image(320, 200, "png")
  private lazy val jpg = image(64, 48, "jpg")
  private lazy val pngA = image(16, 16, "png", argb = true)

  private lazy val media = Seq(
    MediaRow(1L, png, MediaMeta("image", 320, 200, 0L, "png")),
    MediaRow(2L, jpg, MediaMeta("image", 64, 48, 0L, "jpeg")),
    MediaRow(3L, junk(3, 1024), MediaMeta("video", 1280, 720, 3500L, "h264")),
    MediaRow(4L, junk(4, 99), MediaMeta("image", 10, 10, 0L, "png")), // corrupt
    MediaRow(5L, pngA, MediaMeta("image", 16, 16, 0L, "png")))
    .toDS()

  test("binary media schema round-trips through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    media.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("content").dataType.typeName == "binary")
    assert(back.schema("meta").dataType.typeName == "struct")
    assert(back.count() == 5)
  }

  test("sniffImage reads REAL dimensions/channels/format from the bytes") {
    assert(Multimodal.sniffImage(png).contains(ImageInfo(320, 200, 3, "png")))
    val j = Multimodal.sniffImage(jpg).get
    assert(j.width == 64 && j.height == 48 && j.format == "jpeg")
    // RGBA png reports the alpha channel
    assert(Multimodal.sniffImage(pngA).contains(ImageInfo(16, 16, 4, "png")))
    // junk bytes are not an image
    assert(Multimodal.sniffImage(junk(9, 512)).isEmpty)
  }

  test("feature extraction decodes for real, flags corrupt blobs, and is " +
      "batch-insensitive") {
    val f1 = Multimodal.extractImageFeatures(media, batchSize = 2)
      .collect().sortBy(_.media_id)
    val f2 = Multimodal.extractImageFeatures(media, batchSize = 32)
      .collect().sortBy(_.media_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    // real dimensions come from the BYTES, not the declared metadata
    val byId = f1.map(f => f.media_id -> f).toMap
    assert(byId(1L).decode_ok && byId(1L).width == 320 && byId(1L).height == 200)
    assert(byId(2L).decode_ok && byId(2L).width == 64 && byId(2L).height == 48)
    assert(byId(5L).channels == 4)
    // corrupt / non-image rows are quarantined, not thrown
    assert(!byId(3L).decode_ok && !byId(4L).decode_ok)
    assert(byId(4L).width == -1 && byId(4L).features.forall(_ == 0f))
    // gradient image: pixel stats are real — mean luma strictly inside (0,1)
    // and the two x-halves differ (red ramps left to right)
    val f = byId(1L).features
    assert(f(3) > 0.05f && f(3) < 0.95f, f.mkString(","))
    assert(math.abs(f(4) - f(5)) > 0.01f, f.mkString(","))
    assert(f1.forall(_.features.length == 8))
  }

  test("sniffImages triage compares declared metadata against the bytes") {
    val t = Multimodal.sniffImages(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(t(1L).getBoolean(4) && t(1L).getInt(5) == 320)
    assert(!t(3L).getBoolean(4)) // video blob: no JDK image reader
    assert(t(5L).getInt(7) == 4) // alpha channel sniffed from header
  }

  test("frame sampling explodes video rows only, at the sample period") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L).collect()
    assert(frames.forall(_.media_id == 3L))
    assert(frames.map(_.offset_ms).sorted.toSeq == Seq(0L, 1000L, 2000L, 3000L))
  }

  /** A real ANIMATED GIF via the JDK's sequence writer: `n` frames,
    * frame i uniformly gray at level `40*i` (distinct mean luma per
    * frame). */
  private def animatedGif(n: Int, w: Int = 20, h: Int = 10): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until n).foreach { i =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = 40 * i
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
        null)
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    out.toByteArray
  }

  test("sampleAnimationFrames REALLY decodes animated-GIF frames: " +
      "count from the container, luma from the pixels, non-GIF " +
      "quarantined") {
    val gif = animatedGif(5)
    val rows = Seq(
      MediaRow(11L, gif, MediaMeta("video", 20, 10, 500L, "gif")),
      MediaRow(12L, junk(12, 500), MediaMeta("video", 64, 64, 900L, "h264")),
      MediaRow(13L, png, MediaMeta("image", 320, 200, 0L, "png"))).toDS()
    val out = Multimodal.sampleAnimationFrames(rows, everyNth = 2)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getInt(2),
        r.getInt(3), r.getInt(4), r.getInt(5), r.getDouble(6)))
    // the animation explodes to frames 0, 2, 4 of 5
    val anim = out.filter(_._1 == 11L).sortBy(_._3)
    assert(anim.map(r => (r._3, r._4, r._5, r._6)).toSeq ==
      Seq((0, 5, 20, 10), (2, 5, 20, 10), (4, 5, 20, 10)))
    // frame luma follows the painted gray levels (0, 80, 160)/255
    val lumas = anim.map(_._7)
    assert(math.abs(lumas(0) - 0.0) < 0.02)
    assert(math.abs(lumas(1) - 80.0 / 255) < 0.02)
    assert(math.abs(lumas(2) - 160.0 / 255) < 0.02)
    // junk video bytes and a single-frame PNG both quarantine as 1 row
    assert(out.filter(_._1 == 12L).toSeq == Seq((12L, false, -1, -1, -1, -1, -1.0)))
    assert(out.filter(_._1 == 13L).toSeq == Seq((13L, false, -1, -1, -1, -1, -1.0)))
  }

  /** A real WAV: 16-bit signed little-endian mono PCM through the JDK's
    * own writer. `amp` = sine amplitude in [0,1] at `hz`. */
  private def wav(seconds: Double, amp: Double, hz: Double,
      rate: Float = 8000f): Array[Byte] = {
    val n = (seconds * rate).toInt
    val bytes = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val v = (amp * math.sin(2 * math.Pi * hz * i / rate) * 32767).toInt
      bytes(i * 2) = (v & 0xff).toByte
      bytes(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("extractAudioFeatures REALLY decodes WAV: header facts + RMS/" +
      "peak/zero-cross from the samples, non-audio quarantined") {
    val rows = Seq(
      MediaRow(21L, wav(0.5, 0.5, 440), MediaMeta("audio", 0, 0, 500L, "wav")),
      MediaRow(22L, wav(0.25, 0.0, 440), MediaMeta("audio", 0, 0, 250L, "wav")),
      MediaRow(23L, junk(23, 800), MediaMeta("audio", 0, 0, 100L, "mp3")))
      .toDS()
    val out = Multimodal.extractAudioFeatures(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    val sine = out(21L)
    assert(sine.getBoolean(1))
    assert(sine.getInt(2) == 8000 && sine.getInt(3) == 1 &&
      sine.getInt(4) == 16)
    assert(sine.getLong(5) == 4000 && sine.getLong(6) == 500)
    // 440 Hz sine at amplitude 0.5: rms = 0.5/sqrt(2), peak ~ 0.5,
    // zero-crossing rate ~ 2 * 440 / 8000 = 0.11
    assert(math.abs(sine.getDouble(7) - 0.5 / math.sqrt(2)) < 0.01)
    assert(math.abs(sine.getDouble(8) - 0.5) < 0.01)
    assert(math.abs(sine.getDouble(9) - 0.11) < 0.005)
    // silence decodes fine with zero energy
    val silent = out(22L)
    assert(silent.getBoolean(1) && silent.getDouble(7) == 0.0 &&
      silent.getDouble(8) == 0.0 && silent.getDouble(9) == 0.0)
    // junk mp3 bytes quarantine, never throw
    assert(!out(23L).getBoolean(1) && out(23L).getInt(2) == -1)
  }

  test("resize metadata clamps to bounding box, keeps aspect ratio") {
    val out = Multimodal.resizeMeta(media.toDF, maxDim = 160)
      .select("media_id", "resized_width", "resized_height")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 160, 100)))   // 320x200 -> 160x100
    assert(out(2)._2 <= 160 && out(2)._3 <= 160)
  }

  test("resizeImages REALLY resamples pixels: output re-decodes at the " +
      "resizeMeta dimensions, small images pass through, corrupt flagged") {
    val out = Multimodal.resizeImages(media, maxDim = 160)
      .collect().map(r => r.media_id -> r).toMap
    // 320x200 -> 160x100, and the bytes are a real PNG of that size
    val big = out(1L)
    assert(big.decode_ok && big.width == 160 && big.height == 100)
    val decoded = Multimodal.sniffImage(big.content).get
    assert(decoded.width == 160 && decoded.height == 100)
    assert(decoded.format == "png")
    // already inside the box: original bytes pass through untouched
    val small = out(2L)
    assert(small.decode_ok && small.width == 64 && small.height == 48)
    assert(small.content.sameElements(jpg))
    // corrupt blob -> quarantine row, not an exception
    val bad = out(4L)
    assert(!bad.decode_ok && bad.content.isEmpty)
    // the resample is a real average of the source gradient: the mean
    // luma of the resized image stays close to the original's
    val origLuma = Multimodal.pixelFeatures(
      ImageIO.read(new java.io.ByteArrayInputStream(png)))(3)
    val newLuma = Multimodal.pixelFeatures(
      ImageIO.read(new java.io.ByteArrayInputStream(big.content)))(3)
    assert(math.abs(origLuma - newLuma) < 0.02,
      s"resample drifted mean luma: $origLuma -> $newLuma")
  }

  test("resizeImages preserves alpha: transparent regions stay transparent") {
    // 320x200 ARGB: left half fully transparent, right half opaque red
    val src = new BufferedImage(320, 200, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 200; x <- 160 until 320)
      src.setRGB(x, y, 0xffff0000)
    val out = new ByteArrayOutputStream()
    ImageIO.write(src, "png", out)
    val rows = Seq(MediaRow(9L, out.toByteArray,
      MediaMeta("image", 320, 200, 0L, "png"))).toDS()
    val resized = Multimodal.resizeImages(rows, maxDim = 160)
      .collect().head
    assert(resized.decode_ok && resized.width == 160 && resized.height == 100)
    val back = ImageIO.read(new java.io.ByteArrayInputStream(resized.content))
    assert(back.getColorModel.hasAlpha, "alpha channel dropped on resize")
    assert(((back.getRGB(5, 50) >>> 24) & 0xff) == 0,
      "transparent region became opaque (composited onto black)")
    assert(((back.getRGB(150, 50) >>> 24) & 0xff) == 0xff,
      "opaque region lost alpha")
  }
}
