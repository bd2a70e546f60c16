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

  test("streaming dedup drops re-delivered events within the watermark") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.dedupStream(input.toDF)
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      // re-deliver batch1 (duplicates) plus one genuinely new event
      input.addData(batch1 :+ batch2.head: _*); q.processAllAvailable()
      val got = spark.table("dedup")
      assert(got.count() == 4) // 3 originals + 1 new, dupes dropped
      assert(got.select("fp").distinct().count() == 4)
      // parity: batch dropDuplicates on the same fingerprint
      import org.apache.spark.sql.functions._
      val batchFp = (batch1 ++ batch1 :+ batch2.head).toDF
        .withColumn("fp",
          md5(concat_ws("|", col("user_id"), col("ts"), col("value"))))
        .dropDuplicates("fp")
      assert(batchFp.count() == 4)
    } finally q.stop()
  }

  test("stream-stream interval join pairs clicks with prior impressions") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = EventStream.intervalJoin(imps.toDF, clicks.toDF)
      .writeStream.format("memory").queryName("ij")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData(batch1: _*)
      // user 1 clicks 10:30 — within 1h after the 10:05 impression but
      // BEFORE the 10:40 one; user 2 clicks 13:00 — outside every horizon
      clicks.addData(
        Event(ts("2024-01-01 10:30:00"), 1L, 0.0),
        Event(ts("2024-01-01 13:00:00"), 2L, 0.0))
      q.processAllAvailable()
      val got = spark.table("ij")
        .select("user_id", "i_ts")
        .as[(Long, Timestamp)].collect().toSeq.sorted
      assert(got == Seq((1L, ts("2024-01-01 10:05:00"))))
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

  test("closedSessions: event-time timeout emits each session once, " +
      "matching batch session_window bounds") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.closedSessions(input.toDS(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("closed")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two sessions split by a 35-min gap (second closes by
      // timeout); user 2: one session extended ACROSS micro-batches
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(Event(ts("2024-01-01 11:20:00"), 2L, 1.0))
      q.processAllAvailable()
      // cross-batch straggler: 11:15 arrives AFTER 11:20 (inside the
      // 10-min watermark) and inside the gap — it must extend user 2's
      // session WITHOUT rewinding lastTs from 11:20 (a rewind would
      // close the session at 11:45, diverging from session_window)
      input.addData(Event(ts("2024-01-01 11:15:00"), 2L, 0.5))
      q.processAllAvailable()
      // watermark driver: a far-future event pushes event time past every
      // open session's gap horizon, firing the timeouts
      input.addData(Event(ts("2024-01-02 00:00:00"), 99L, 0.0))
      q.processAllAvailable()
      input.addData(Event(ts("2024-01-03 00:00:00"), 99L, 0.0))
      q.processAllAvailable()
      val got = spark.table("closed")
        .filter($"user_id" =!= 99L)
        .orderBy("user_id", "session_start")
        .as[ClosedSession].collect().toSeq
      // batch truth: same rows through the built-in session_window
      val batch = EventStream.sessionAgg(
          (batch1 ++ Seq(Event(ts("2024-01-01 11:20:00"), 2L, 1.0),
            Event(ts("2024-01-01 11:15:00"), 2L, 0.5))).toDF,
          withWatermark = false)
        .orderBy("user_id", "session_start")
        .as[ClosedSession].collect().toSeq
      assert(got == batch, s"stream $got != batch $batch")
      assert(got.map(_.n_events) == Seq(1L, 1L, 3L))
      // exactly-once: no session row was emitted twice
      assert(got.distinct.size == got.size)
    } finally q.stop()
  }

  test("closedSessions divergent straggler: absorbed into the open " +
      "session, start not rewound — the documented batch divergence") {
    // ADVICE r6: pin the one reachable divergence from batch
    // session_window explicitly. A straggler that lands BETWEEN an
    // already-emitted (in-batch gap-split) session and the open one is
    // absorbed into the open session (older-than-lastTs passes the gap
    // test) and cannot rewind its recorded start; batch semantics would
    // give that straggler its own earlier session start instead.
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.closedSessions(input.toDS(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("diverge")
      .outputMode(OutputMode.Append()).start()
    try {
      // one micro-batch, 60-min gap: [10:00,10:30] emits IMMEDIATELY,
      // 11:00 stays open
      input.addData(Event(ts("2024-01-01 10:00:00"), 3L, 1.0),
        Event(ts("2024-01-01 11:00:00"), 3L, 2.0))
      q.processAllAvailable()
      // straggler 10:40 (>= the 10:30 watermark, so NOT dropped): batch
      // truth would start a session at 10:40 ending 11:30; the stream
      // absorbs it into the open 11:00 session
      input.addData(Event(ts("2024-01-01 10:40:00"), 3L, 4.0))
      q.processAllAvailable()
      // push the watermark far past every horizon to flush the timeout
      input.addData(Event(ts("2024-01-02 00:00:00"), 99L, 0.0))
      q.processAllAvailable()
      input.addData(Event(ts("2024-01-03 00:00:00"), 99L, 0.0))
      q.processAllAvailable()
      val got = spark.table("diverge").filter($"user_id" === 3L)
        .orderBy("session_start").as[ClosedSession].collect().toSeq
      val batch = EventStream.sessionAgg(
          Seq(Event(ts("2024-01-01 10:00:00"), 3L, 1.0),
            Event(ts("2024-01-01 11:00:00"), 3L, 2.0),
            Event(ts("2024-01-01 10:40:00"), 3L, 4.0)).toDF,
          withWatermark = false)
        .orderBy("session_start").as[ClosedSession].collect().toSeq
      // membership, counts, totals, and session END all agree with batch
      assert(got.size == 2 && batch.size == 2)
      assert(got.map(_.n_events) == batch.map(_.n_events))
      assert(got.map(_.sum_value) == batch.map(_.sum_value))
      assert(got.map(_.session_end) == batch.map(_.session_end))
      assert(got.head == batch.head) // the gap-split session is identical
      // the ONE divergent column: the absorbed straggler's session start
      // (stream keeps 11:00; batch rewinds to the straggler's 10:40)
      assert(got(1).session_start == ts("2024-01-01 11:00:00"))
      assert(batch(1).session_start == ts("2024-01-01 10:40:00"))
    } finally q.stop()
  }

  test("foreachBatch idempotent sink: a replayed batch does not duplicate") {
    implicit val ctx = spark.sqlContext
    val path = java.nio.file.Files
      .createTempDirectory("graft_sink").toString + "/out"
    val input = MemoryStream[Event]
    val q = input.toDF.writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        EventStream.writeBatchIdempotent(b, id, path))
      .start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      assert(spark.read.parquet(path).count() == 4)
      // simulate post-failure re-delivery of batch 1: same epoch id, same
      // rows — the dynamic partition overwrite replaces, never appends
      EventStream.writeBatchIdempotent(batch2.toDF, 1L, path)
      assert(spark.read.parquet(path).count() == 4)
      // and the other batch's partition was untouched
      assert(spark.read.parquet(path)
        .filter($"batch_id" === 0).count() == 3)
    } finally q.stop()
  }

  test("foreachBatch CDC upsert sink: merge, late update, replay idempotence") {
    implicit val ctx = spark.sqlContext
    val table = java.nio.file.Files
      .createTempDirectory("graft_upsert_sink").toString + "/t"
    val input = MemoryStream[(Long, String, String, Long)]
    val q = input.toDS
      .toDF("id", "day", "payload", "version")
      .writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        EventStream.upsertSink(b, table, Seq("id"), "day", "version"))
      .start()
    try {
      input.addData((1L, "d1", "a", 1L), (2L, "d1", "b", 1L),
        (3L, "d2", "c", 1L))
      q.processAllAvailable()
      // batch 2: update key 1 (higher version), new key 4, stale key 2
      input.addData((1L, "d1", "a2", 2L), (4L, "d2", "d", 1L),
        (2L, "d1", "STALE", 0L))
      q.processAllAvailable()
      val got = spark.read.parquet(table)
        .select($"id", $"payload").as[(Long, String)].collect().toMap
      assert(got == Map(1L -> "a2", 2L -> "b", 3L -> "c", 4L -> "d"))
      // re-deliver batch 2 (at-least-once): merge semantics make it a noop
      EventStream.upsertSink(
        Seq((1L, "d1", "a2", 2L), (4L, "d2", "d", 1L), (2L, "d1", "STALE", 0L))
          .toDF("id", "day", "payload", "version"),
        table, Seq("id"), "day", "version")
      val replayed = spark.read.parquet(table)
        .select($"id", $"payload").as[(Long, String)].collect().toMap
      assert(replayed == got)
    } finally q.stop()
  }

  test("stream-static enrich broadcasts the dim; unmatched users keep null") {
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "gold")).toDF("user_id", "tier")
    val input = MemoryStream[Event]
    val q = EventStream.enrich(input.toDF, dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      val got = spark.table("enriched")
        .orderBy("ts").select("user_id", "tier")
        .as[(Long, Option[String])].collect().toSeq
      assert(got == Seq((1L, Some("gold")), (1L, Some("gold")), (2L, None)))
      // the static side is a broadcast probe, not stream state — asserted
      // on the identical batch plan (the streaming plan adds wrappers)
      val batchPlan = EventStream.enrich(batch1.toDF, dim)
        .queryExecution.executedPlan.toString
      assert(batchPlan.contains("BroadcastHashJoin"), batchPlan.take(800))
    } finally q.stop()
  }
}
