package graft.streaming

import java.sql.Timestamp

import graft.Fns
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class Event(ts: Timestamp, user_id: Long, value: Double)

final case class UserState(n: Long, total: Double)
final case class UserTotal(user_id: Long, n: Long, total: Double)

final case class SessionState(
    start: Timestamp, lastTs: Timestamp, n: Long, total: Double)
final case class ClosedSession(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    sum_value: Double)

/** Structured Streaming surface (SURVEY.md §2.10): the SAME window
  * expressions as the batch operators (`operators.TimeWindows`), applied
  * under `readStream` with a watermark — one definition, two execution
  * modes, which is the point of declaring plans and letting the engine pick
  * incremental vs batch execution.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark (2
  * hours of open windows per key); `flatMapGroupsWithState` keeps one tiny
  * state row per user with processing-time timeout as the eviction lever.
  */
object EventStream {

  /** Tumbling 1-hour counts/sums; identical agg to batch q_time_window. */
  def hourlyAgg(events: DataFrame, withWatermark: Boolean = true): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "2 hours") else events
    src.groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"), Fns.dsum6(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n_events"), col("sum_value"))
  }

  /** Session windows (30-minute gap) per user; identical to batch
    * q_session_window. */
  def sessionAgg(events: DataFrame, withWatermark: Boolean = true): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "2 hours") else events
    src.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Fns.dsum6(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"),
        col("sum_value"))
  }

  /** Streaming exact dedup (extension X1 under readStream): drops
    * re-deliveries of the same logical event, keyed by a content
    * fingerprint, with state bounded by the watermark
    * (`dropDuplicatesWithinWatermark` evicts fingerprints once the event
    * time passes out of the watermark — at 100 TB/day the state holds only
    * the watermark horizon, not the full history). Same fingerprint
    * expression as the batch `q_dedup_exact` shape. */
  def dedupStream(events: DataFrame, watermark: String = "2 hours")
      : DataFrame =
    events.withWatermark("ts", watermark)
      .withColumn("fp",
        md5(concat_ws("|", col("user_id"), col("ts"), col("value"))))
      .dropDuplicatesWithinWatermark("fp")

  /** Watermarked stream-stream interval join: each click pairs with the
    * same user's impressions at most `horizon` before it. Both sides'
    * buffers are bounded by watermark + interval — the canonical
    * state-bounded stream-stream join shape. */
  def intervalJoin(
      impressions: DataFrame,
      clicks: DataFrame): DataFrame = {
    val imp = impressions.withWatermark("ts", "2 hours")
      .select(col("user_id").as("i_user"), col("ts").as("i_ts"),
        col("value").as("i_value"))
    val clk = clicks.withWatermark("ts", "2 hours")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    imp.join(clk,
      expr("i_user = c_user AND c_ts >= i_ts AND " +
        "c_ts <= i_ts + INTERVAL 1 HOUR"))
      .select(col("i_user").as("user_id"), col("i_ts"), col("c_ts"),
        col("i_value"))
  }

  /** Stream-static enrichment: join the event stream against a STATIC
    * dimension table (broadcast — the static side never buffers state; each
    * micro-batch probes the same hashed relation). This is the streaming
    * face of the star transform's dim-attach (J1): same join expression,
    * stateless on the stream side. */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  /** Idempotent (effectively exactly-once) parquet sink via foreachBatch:
    * each micro-batch lands in its own `batch_id=` partition with DYNAMIC
    * partition overwrite, so a replayed batch (post-failure re-delivery
    * with the same epoch id) overwrites its own partition instead of
    * appending duplicates. This is the standard end-to-end-exactly-once
    * recipe for non-transactional stores. */
  def writeBatchIdempotent(batch: DataFrame, batchId: Long, path: String)
      : Unit =
    PartialsStore.sink(batch, batchId, path)

  /** CDC upsert sink: merge each micro-batch of key-versioned updates into
    * a partitioned parquet serving table ([[graft.io.Upsert.mergeByKey]] —
    * touched partitions only). The first batch bootstraps the table.
    *
    * Replay-idempotent BY THE MERGE SEMANTICS, not by batch-id bookkeeping:
    * re-delivering a batch re-merges the same (key, version) rows and the
    * higher-version-wins rule leaves the table unchanged — so this sink
    * tolerates foreachBatch's at-least-once contract without tracking
    * epochs. Scale: each micro-batch costs O(touched partitions), never a
    * table rewrite. */
  def upsertSink(
      batch: DataFrame,
      tablePath: String,
      keyCols: Seq[String],
      partitionCol: String,
      versionCol: String): Unit = {
    val spark = batch.sparkSession
    val p = new org.apache.hadoop.fs.Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      // bootstrap applies the same one-row-per-key rule as the merge
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*).orderBy(col(versionCol).desc)
      batch.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
        .write.partitionBy(partitionCol)
        .option("compression", "snappy").parquet(tablePath)
    } else
      graft.io.Upsert.mergeByKey(
        spark, tablePath, batch, keyCols, partitionCol, versionCol)
  }

  /** Incremental sketch partials: each micro-batch lands ONE row per day
    * of (day, hll user sketch, n_events) in its own `batch_id=` partition
    * (dynamic overwrite → replay-idempotent, same recipe as
    * [[writeBatchIdempotent]]). Sketches merge associatively, so the
    * rollup never needs the raw events again — any window (7-day rolling,
    * monthly, all-time) is a `hll_union_agg` over the stored partials.
    * This is the streaming producer of the same partials the batch
    * `q_rolling_distinct` consumes. */
  def sketchPartials(batch: DataFrame, batchId: Long, path: String): Unit =
    PartialsStore.sink(
      batch
        .groupBy(to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"),
          count(lit(1)).as("n_events")),
      batchId, path)

  /** Incremental KLL QUANTILE partials — the quantile member of the
    * stored-partials family beside [[sketchPartials]]' HLL distincts
    * (the streaming producer of the same artifact batch
    * `q_kll_quantiles` builds): each micro-batch lands per-day
    * `(day, kll binary)` rows — one per (input partition, day), no
    * event counts — in its own `batch_id=`
    * partition (dynamic overwrite → replay-idempotent). KLL merge
    * preserves the published rank-error bound, so any later percentile
    * question over any day range is answered from the stored partials
    * by [[quantilesFromPartials]] — the raw values are never rescanned. */
  def kllPartials(batch: DataFrame, batchId: Long, path: String): Unit =
    PartialsStore.sink(
      graft.functions.QuantileSketch
        .partials(batch, to_date(col("ts")), col("value"))
        .withColumnRenamed("scope", "day"),
      // ALL (input partition × day) sketch rows land — merging here
      // would need a sketch-merge aggregate; the reader merges instead,
      // and KLL merge keeps the error bound either way
      batchId, path)

  /** Quantiles (+ the published rank-confidence envelope) for each
    * requested rank over a DAY RANGE, answered purely from stored
    * [[kllPartials]] — merge is a driver-side fold over the (small)
    * per-day × per-batch sketch rows, ~3 KB each. A range matching no
    * stored day returns `Seq.empty` (a quantile of zero observations is
    * undefined; Datasketches would otherwise throw from the empty
    * sketch — ADVICE r7). */
  def quantilesFromPartials(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      ps: Seq[Double],
      fromDay: Option[String] = None,
      toDay: Option[String] = None): Seq[(Double, Double, Double, Double)] = {
    import spark.implicits._
    var df = spark.read.parquet(path)
    fromDay.foreach(f => df = df.filter(col("day") >= lit(f).cast("date")))
    toDay.foreach(t => df = df.filter(col("day") <= lit(t).cast("date")))
    val parts = df.select(col("kll")).as[Array[Byte]].collect()
    val merged = graft.functions.QuantileSketch.merge(parts.iterator)
    if (merged.isEmpty) Seq.empty
    else graft.functions.QuantileSketch.quantilesWithBounds(merged, ps)
  }

  /** Roll stored partials up to per-day totals (merging across batches),
    * plus the 7-day rolling distinct — no event rescan. */
  def rollupPartials(spark: org.apache.spark.sql.SparkSession, path: String)
      : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("day")).rowsBetween(-6, 0)
    spark.read.parquet(path)
      .groupBy(col("day"))
      .agg(hll_union_agg(col("sk")).as("sk"),
        sum(col("n_events")).as("n_events"))
      .withColumn("users_1d", hll_sketch_estimate(col("sk")))
      .withColumn("users_7d", hll_sketch_estimate(hll_union_agg(col("sk"))
        .over(w)))
      .select(col("day"), col("n_events"), col("users_1d"), col("users_7d"))
  }

  /** Closed-session emission via EVENT-TIME TIMEOUT — the state-eviction
    * mechanism [[sessionAgg]]'s built-in `session_window` hides: one
    * `SessionState` row per user, extended while events arrive within
    * `gapMs`, and EMITTED (then removed) when the watermark passes the
    * session's gap horizon — `state.setTimeoutTimestamp` + `hasTimedOut`
    * is the lever that bounds state at 100 TB/day, and Append-mode output
    * means a session row is written exactly once, when it can no longer
    * change. Session bounds match the batch/session_window contract
    * (`end = last event + gap`), pinned by the parity test. Events are
    * processed in event-time order within each micro-batch; a session
    * split by the gap inside one batch closes immediately, without
    * waiting for the timeout. Contract for cross-batch stragglers: a
    * late event is ABSORBED into the user's open session (an event older
    * than `lastTs` trivially passes the gap test) — it counts toward
    * n/total but cannot rewind the recorded session start, so a
    * straggler that batch `session_window` would assign to its own
    * earlier-starting session (or use to drag the open session's start
    * back) diverges in the start column only — bounded staleness the
    * watermark caps, pinned EXPLICITLY by the divergent-straggler parity
    * test (ADVICE r6). A post-timeout straggler inside an emitted
    * session's span cannot produce an overlapping duplicate row: the
    * timeout fired because watermark > lastTs + gap, so any event inside
    * that span is below the watermark and dropped. An exact replay under
    * arbitrary reordering would need the batch operator over the closed
    * log. */
  def closedSessions(
      events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000,
      watermark: String = "2 hours"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    def close(uid: Long, s: SessionState): ClosedSession =
      ClosedSession(uid, s.start, new Timestamp(s.lastTs.getTime + gapMs),
        s.n, s.total)
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(close(uid, s))
          } else {
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              cur = cur match {
                case Some(s) if e.ts.getTime - s.lastTs.getTime <= gapMs =>
                  // max(): a cross-batch straggler inside the gap joins
                  // the session but must never REWIND lastTs — a rewound
                  // end would fire the timeout early and could emit
                  // session_end < session_start (found by review)
                  Some(SessionState(s.start,
                    if (e.ts.after(s.lastTs)) e.ts else s.lastTs,
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= close(uid, s)
                  Some(SessionState(e.ts, e.ts, 1L, e.value))
                case None =>
                  Some(SessionState(e.ts, e.ts, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs.getTime + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Custom keyed state: running per-user event count + value total via
    * flatMapGroupsWithState (the KeyValueGroupedDataset state API). */
  def userTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserTotal](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.n
          var total = prev.total
          batch.foreach { e => n += 1; total += e.value }
          state.update(UserState(n, total))
          Iterator(UserTotal(userId, n, total))
      }
  }
}
