package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val batch1 = Seq(
    Event(ts("2024-01-01 10:05:00"), 1L, 1.5),
    Event(ts("2024-01-01 10:40:00"), 1L, 2.5),
    Event(ts("2024-01-01 11:10:00"), 2L, 4.0))
  private val batch2 = Seq(
    Event(ts("2024-01-01 11:30:00"), 1L, 1.0))

  test("streaming hourly agg matches batch semantics incrementally") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.hourlyAgg(input.toDF, withWatermark = false)
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      val got = spark.table("hourly")
        .orderBy("window_start")
        .select("window_start", "n_events", "sum_value")
        .as[(Timestamp, Long, Double)].collect().toSeq
      assert(got == Seq(
        (ts("2024-01-01 10:00:00"), 2L, 4.0),
        (ts("2024-01-01 11:00:00"), 2L, 5.0)))
      // parity: the same function over the same rows as a plain batch
      val batch = EventStream
        .hourlyAgg((batch1 ++ batch2).toDF, withWatermark = false)
        .orderBy("window_start")
        .select("window_start", "n_events", "sum_value")
        .as[(Timestamp, Long, Double)].collect().toSeq
      assert(batch == got)
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps running per-user totals across batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.userTotals(input.toDS())
      .writeStream.format("memory").queryName("totals")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      // last update per user wins
      val got = spark.table("totals")
        .groupByKey(r => r.getAs[Long]("user_id"))
        .mapGroups((k, it) => k -> it.map(r =>
          (r.getAs[Long]("n"), r.getAs[Double]("total"))).toSeq.maxBy(_._1))
        .collect().toMap
      assert(got(1L) == ((3L, 5.0)))
      assert(got(2L) == ((1L, 4.0)))
    } finally q.stop()
  }

  test("session windows close on the 30-minute gap (batch run)") {
    val out = EventStream.sessionAgg(batch1.toDF, withWatermark = false)
      .orderBy("user_id", "session_start")
      .select("user_id", "n_events")
      .as[(Long, Long)].collect().toSeq
    // user 1: 10:05 and 10:40 are 35min apart -> two sessions
    assert(out == Seq((1L, 1L), (1L, 1L), (2L, 1L)))
  }
}
