package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def blob(seed: Int, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((seed * 31 + i * 7) % 251).toByte)

  private lazy val media = Seq(
    MediaRow(1L, blob(1, 256), MediaMeta("image", 800, 600, 0L, "png")),
    MediaRow(2L, blob(2, 512), MediaMeta("image", 1920, 1080, 0L, "jpeg")),
    MediaRow(3L, blob(3, 1024), MediaMeta("video", 1280, 720, 3500L, "h264")))
    .toDS()

  test("binary media schema round-trips through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    media.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("content").dataType.typeName == "binary")
    assert(back.schema("meta").dataType.typeName == "struct")
    assert(back.count() == 3)
  }

  test("batched feature extraction is deterministic and batch-insensitive") {
    val f1 = Multimodal.extractImageFeatures(media, batchSize = 2)
      .collect().sortBy(_.media_id)
    val f2 = Multimodal.extractImageFeatures(media, batchSize = 32)
      .collect().sortBy(_.media_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.forall(_.features.length == 8))
    assert(f1.map(_.n_bytes).toSeq == Seq(256, 512, 1024))
    // same bytes -> same features; different bytes -> different checksum
    assert(f1(0).checksum != f1(1).checksum)
  }

  test("frame sampling explodes video rows only, at the sample period") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L).collect()
    assert(frames.forall(_.media_id == 3L))
    assert(frames.map(_.offset_ms).sorted.toSeq == Seq(0L, 1000L, 2000L, 3000L))
  }

  test("resize metadata clamps to bounding box, keeps aspect ratio") {
    val out = Multimodal.resizeMeta(media.toDF, maxDim = 640)
      .select("media_id", "resized_width", "resized_height")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 640, 480)))   // 800x600 -> 640x480
    assert(out(1) == ((2L, 640, 360)))   // 1920x1080 -> 640x360
    assert(out(2)._2 <= 640 && out(2)._3 <= 640)
  }
}
