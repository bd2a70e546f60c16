package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAM-STREAM interval join — the attribution shape (impressions
  * matched to their clicks within a conversion window) and the one
  * canonical Structured Streaming surface the engine's streaming tier
  * had not yet covered: both sides unbounded, both sides buffering
  * state, eviction driven entirely by watermarks + the join's time
  * bound.
  *
  * Why the TIME-INTERVAL condition is the whole scale story: an
  * equality-only stream-stream join must keep every row of both sides
  * forever (any future row might match). With
  * `click_ts ∈ [imp_ts, imp_ts + maxDelay]` and watermarks on both
  * sides, Spark derives a state horizon per side — an impression can be
  * dropped once the click watermark passes `imp_ts + maxDelay`, a click
  * once the impression watermark passes its own `click_ts` — so state
  * is bounded by (arrival rate × horizon), independent of stream
  * lifetime. At 100 TB/day that bound IS the operator: without it the
  * join is an unbounded-memory bug, with it a fixed-size window of hot
  * keys. State lives in the checkpoint store keyed by `imp_id` (the
  * equi-part of the predicate — Spark shuffles both sides on it, the
  * same hash-partitioning economics as a batch shuffle join).
  *
  * Two output modes of the same join, both append-only:
  *  - [[attributedClicks]] (INNER): one row per (impression, click)
  *    pair inside the window — emitted as soon as both sides are
  *    present (matches never retract).
  *  - [[attributionReport]] (LEFT OUTER): additionally one
  *    null-click row per UNCONVERTED impression, emitted only once the
  *    watermark proves no in-window click can still arrive — the
  *    streaming twin of the batch funnel's left join, with the
  *    null-emission delay being exactly the state horizon.
  *
  * Event-time semantics (late data): a click later than the watermark
  * horizon is dropped by the watermark before the join sees it — the
  * impression it would have matched may already be emitted as
  * unconverted. That is the standard at-most-once-per-pair contract of
  * watermarked stream-stream joins; the spec pins both the match and
  * the drop.
  */
object JoinStream {

  /** An ad/search impression: the left (sparse-state) side. */
  final case class Impression(imp_id: Long, user_id: Long, imp_ts: Timestamp)

  /** A click referencing its impression: the right side. */
  final case class Click(click_id: Long, click_imp_id: Long,
      click_ts: Timestamp)

  private def sides(
      impressions: DataFrame,
      clicks: DataFrame,
      maxDelay: String,
      watermark: String): (DataFrame, DataFrame, org.apache.spark.sql.Column) = {
    val i = impressions.withWatermark("imp_ts", watermark)
    val c = clicks.withWatermark("click_ts", watermark)
    val cond = expr(
      s"""imp_id = click_imp_id AND
         |click_ts >= imp_ts AND
         |click_ts <= imp_ts + INTERVAL $maxDelay""".stripMargin)
    (i, c, cond)
  }

  /** INNER interval join: one append-only row per click attributed to
    * its impression within `maxDelay`. */
  def attributedClicks(
      impressions: DataFrame,
      clicks: DataFrame,
      maxDelay: String = "10 minutes",
      watermark: String = "20 minutes"): DataFrame = {
    val (i, c, cond) = sides(impressions, clicks, maxDelay, watermark)
    i.join(c, cond)
      .select(col("imp_id"), col("user_id"), col("imp_ts"),
        col("click_id"), col("click_ts"),
        (unix_timestamp(col("click_ts")) - unix_timestamp(col("imp_ts")))
          .as("delay_s"))
  }

  /** LEFT OUTER interval join: attributed rows as above PLUS one
    * null-click row per impression the watermark has proven
    * unconverted. `converted` makes the verdict explicit for downstream
    * aggregation (conversion-rate windows etc.). */
  def attributionReport(
      impressions: DataFrame,
      clicks: DataFrame,
      maxDelay: String = "10 minutes",
      watermark: String = "20 minutes"): DataFrame = {
    val (i, c, cond) = sides(impressions, clicks, maxDelay, watermark)
    i.join(c, cond, "left_outer")
      .select(col("imp_id"), col("user_id"), col("imp_ts"),
        col("click_id"), col("click_ts"),
        col("click_id").isNotNull.as("converted"))
  }
}
