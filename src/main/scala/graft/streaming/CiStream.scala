package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming Wilson-CI conversion monitor — the ninth stored-partials
  * monitor on the [[PartialsStore]] scaffold: per-batch (event_type,
  * exposures, conversions) counts, and the batch `q_wilson_ci` readout
  * over the merged table. This is the always-on confidence band a
  * metrics platform draws around every live conversion rate; the CI
  * (not the point estimate) is what stops a dashboard from paging on
  * day-one noise.
  *
  * Structural sharing, not a parallel edit: the readout reuses the
  * LIVE query's own center/half-width expression strings
  * ([[graft.operators.Inference.wilsonCtrE]] / `wilsonHwE`), so the
  * streamed intervals are bit-equal to `q_wilson_ci` over the same
  * rows by construction — the QualityStream/`Text.pplLm` recipe.
  * Partials are plain counts (sum-associative), so any batch slicing
  * merges to the one-shot table exactly (MonitorSlicingProps).
  *
  * At 100 TB the partials table grows ≤ |event types| rows per
  * micro-batch and the readout scans kilobytes. */
object CiStream {

  /** Per-batch conversion partials: exposures n and conversions k
    * (non-null value, the house conversion proxy) per event type.
    * Replay-idempotent via [[PartialsStore.sink]]. */
  def convPartials(batch: DataFrame, batchId: Long, path: String): Unit =
    PartialsStore.sink(
      batch.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").isNotNull.cast("long")).as("k")),
      batchId, path)

  /** Wilson 95% intervals over all stored batches — the q_wilson_ci
    * expression tree over re-summed exact counts. */
  def wilsonFromPartials(spark: SparkSession, path: String): DataFrame = {
    import graft.operators.Inference.{wilsonCtrE, wilsonHwE}
    PartialsStore.mergedSums(spark, path, Seq("event_type"), Seq("n", "k"))
      .select(col("event_type"), col("n"), col("k"),
        expr("CAST(round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE) " +
          "* 1000000.0, 0) AS BIGINT)").as("p_micro"),
        expr(s"CAST(round($wilsonCtrE - $wilsonHwE, 0) AS BIGINT)")
          .as("lo_micro"),
        expr(s"CAST(round($wilsonCtrE + $wilsonHwE, 0) AS BIGINT)")
          .as("hi_micro"))
      .orderBy(col("event_type"))
  }
}
