package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import JoinStream.{Click, Impression}

/** Stream-stream interval join: in-window matches emit, out-of-window
  * and watermark-late clicks do not, and the left-outer variant emits
  * unconverted impressions only after the watermark proves them so. */
class JoinStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("inner join matches clicks inside the window, drops the rest") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[Impression]
    val clks = MemoryStream[Click]
    val q = JoinStream.attributedClicks(
        imps.toDF, clks.toDF, maxDelay = "10 minutes",
        watermark = "20 minutes")
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData(
        Impression(1L, 100L, ts("2024-01-01 10:00:00")),
        Impression(2L, 200L, ts("2024-01-01 10:00:00")),
        Impression(3L, 300L, ts("2024-01-01 10:00:00")))
      clks.addData(
        Click(11L, 1L, ts("2024-01-01 10:04:00")), // in window -> match
        Click(12L, 2L, ts("2024-01-01 10:15:00")), // past 10 min -> drop
        Click(13L, 99L, ts("2024-01-01 10:04:00"))) // no impression
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select($"imp_id", $"click_id", $"delay_s")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 11L, 240L)), got.toString)

      // a second click on the same impression still matches (join, not
      // first-touch; dedup is a downstream choice)
      clks.addData(Click(14L, 1L, ts("2024-01-01 10:09:00")))
      q.processAllAvailable()
      assert(spark.table("attrib").count() == 2)

      // a click far below BOTH watermarks is dropped by the watermark:
      // first advance event time well past the horizon on both sides
      imps.addData(Impression(4L, 400L, ts("2024-01-01 12:00:00")))
      clks.addData(Click(15L, 4L, ts("2024-01-01 12:00:30")))
      q.processAllAvailable()
      clks.addData(Click(16L, 1L, ts("2024-01-01 10:05:00"))) // very late
      q.processAllAvailable()
      val ids = spark.table("attrib").select($"click_id")
        .as[Long].collect().toSet
      assert(ids == Set(11L, 14L, 15L), s"late click must drop: $ids")
    } finally q.stop()
  }

  test("left-outer join emits unconverted impressions only after the " +
      "watermark proves no click can arrive") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[Impression]
    val clks = MemoryStream[Click]
    val q = JoinStream.attributionReport(
        imps.toDF, clks.toDF, maxDelay = "10 minutes",
        watermark = "20 minutes")
      .writeStream.format("memory").queryName("report")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData(
        Impression(1L, 100L, ts("2024-01-01 10:00:00")), // will convert
        Impression(2L, 200L, ts("2024-01-01 10:00:00"))) // never clicks
      clks.addData(Click(11L, 1L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      val converted = spark.table("report")
        .as[(Long, Long, Timestamp, Option[Long], Option[Timestamp], Boolean)]
        .collect()
      // the match emits promptly; the unconverted row must NOT have
      // emitted yet (watermark still inside the horizon)
      assert(converted.map(r => (r._1, r._4, r._6)).toSet ==
        Set((1L, Some(11L), true)), converted.mkString(","))

      // advance both watermarks far past imp_ts + maxDelay + watermark
      imps.addData(Impression(9L, 900L, ts("2024-01-01 13:00:00")))
      clks.addData(Click(99L, 9L, ts("2024-01-01 13:00:10")))
      q.processAllAvailable()
      // one more micro-batch so the state-store eviction that ran after
      // the previous batch's watermark update lands in the sink
      imps.addData(Impression(10L, 1000L, ts("2024-01-01 13:30:00")))
      q.processAllAvailable()
      val rows = spark.table("report")
        .as[(Long, Long, Timestamp, Option[Long], Option[Timestamp], Boolean)]
        .collect().map(r => (r._1, r._4, r._6)).toSet
      assert(rows.contains((2L, None, false)),
        s"unconverted impression 2 must emit with null click: $rows")
    } finally q.stop()
  }
}
