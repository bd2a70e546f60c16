package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming ANOMALY monitor — the stored-partials member for the
  * time-series tier (the [[EvalStream]] recipe applied to metric
  * streams): each micro-batch lands one row per (event_type, day)
  * holding that batch's exact moment partials — count, Σv and Σv² in
  * micro-units (per-row freeze, the q_ab_test power-sum recipe) — in
  * its own `batch_id=` partition (dynamic overwrite → replay-
  * idempotent). Moments are ASSOCIATIVE, so the z-score rollup never
  * rescans an event: a day split across arbitrarily many micro-batches
  * converges to exactly the one-shot answer — pinned by
  * AnomalyStreamSpec (k-batch ≡ one-shot, replay ≡ once, and ≡ an
  * independent batch recompute straight from events).
  *
  * Contract difference vs q_anomaly_days (stated): the BATCH query
  * scores days by median/MAD — the robust choice offline, but medians
  * are not associative and cannot be maintained from partials without
  * storing per-value state. The streaming monitor scores each day's
  * mean against the mean/σ of the type's day means (each day mean
  * frozen to micro-units before the cross-day sums, so the rollup is
  * exact integers until one final double expression), with the same
  * 3σ fence. A live monitor wants exactly this: cheap associative
  * state, deterministic replay.
  *
  * At 100 TB the partials table grows one (type, day)-grain row set per
  * batch — bounded by types × days, not event volume;
  * `graft.io.Compaction` consolidates `batch_id=` generations exactly
  * as for the other standing stores. */
object AnomalyStream {

  private val D19 = DecimalType(19, 0)

  /** Per-batch (event_type, day)-grain exact moment partials,
    * replay-idempotent via dynamic partition overwrite on batch_id. */
  def momentPartials(batch: DataFrame, batchId: Long, path: String): Unit =
    PartialsStore.sink(
      batch
        .select(col("event_type"), to_date(col("ts")).as("day"),
          expr("CAST(round(value * 1000000.0, 0) AS BIGINT)").as("v6"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"), sum(col("v6")).as("s1"),
          sum(col("v6").cast(D19) * col("v6").cast(D19)).as("s2")),
      batchId, path)

  /** Merged (event_type, day)-grain moments over all stored batches —
    * the one (bounded) shuffle every rollup shares. */
  private def merged(spark: SparkSession, path: String): DataFrame =
    PartialsStore.mergedSums(spark, path,
      Seq("event_type", "day"), Seq("n", "s1", "s2"))

  /** Per-day z-scores of the day mean against the type's day-mean
    * distribution, 3σ fence — computed from the stored partials
    * without rescanning a single event. Day means freeze to
    * micro-units before the cross-day moments so every path (k-batch,
    * one-shot, direct batch recompute) produces identical integers
    * into one identical final expression. */
  def zscoresFromPartials(spark: SparkSession, path: String): DataFrame = {
    val m = merged(spark, path)
      .withColumn("mean_micro",
        expr("CAST(round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 0) " +
          "AS BIGINT)"))
    val t = m.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nd"), sum(col("mean_micro")).as("sm"),
        sum(col("mean_micro").cast(D19) * col("mean_micro").cast(D19))
          .as("sm2"),
        // exact sigma-zero witness: sigma = 0 iff every day mean is
        // equal — integer compare, no decimal-product overflow risk
        min(col("mean_micro")).as("mn"), max(col("mean_micro")).as("mx"))
    m.join(broadcast(t), "event_type")
      .select(col("event_type"), col("day"), col("n"), col("mean_micro"),
        // ADVICE r11 sigma=0 guard: a type with one observed day or
        // constant day means would divide by sigma = 0 and emit
        // NaN/null for exactly the quietest metrics — a "no baseline
        // yet" day must read as defined non-anomalous (z_micro = 0)
        expr("CASE WHEN mn = mx THEN 0L ELSE " +
          "CAST(round((CAST(mean_micro AS DOUBLE) - " +
          "CAST(sm AS DOUBLE) / CAST(nd AS DOUBLE)) / " +
          "sqrt(CAST(sm2 AS DOUBLE) / CAST(nd AS DOUBLE) - " +
          "(CAST(sm AS DOUBLE) / CAST(nd AS DOUBLE)) * " +
          "(CAST(sm AS DOUBLE) / CAST(nd AS DOUBLE))) " +
          "* 1000000.0, 0) AS BIGINT) END").as("z_micro"))
      .withColumn("is_anomaly", abs(col("z_micro")) > 3000000L)
      .orderBy(col("event_type"), col("day"))
  }
}
