package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming FORECAST-CALIBRATION monitor — the sixth stored-partials
  * monitor on the [[PartialsStore]] scaffold: per-batch exact per-day
  * revenue-cent sums (<= one row per order day per batch, trivially
  * sum-associative), and the batch `q_conformal` readout — seasonal-
  * naive day-7 residuals, the 95th-percentile conformal width from
  * the calibration half, empirical coverage on the test half —
  * answered over the merged day table by the SAME
  * [[graft.operators.Inference.conformalReadout]] expression tree the
  * live query uses. A deployed forecaster watches exactly this:
  * drifting coverage is the earliest signal the residual distribution
  * moved out from under the intervals.
  *
  * Unlike the moment/count monitors, the QUANTILE is not assembled
  * from sub-batch partials (order statistics are not associative) —
  * associativity lives one level down, in the per-day cent sums,
  * which the calendar bounds (~2.4k rows at any corpus size). The
  * readout scans kilobytes and is BIT-EQUAL to live `q_conformal`
  * under any batch slicing — pinned by ConformalStreamSpec. */
object ConformalStream {

  /** Per-batch (day, cents) partial revenue sums over raw order rows.
    * Replay-idempotent via [[PartialsStore.sink]]. */
  def dayPartials(batch: DataFrame, batchId: Long, path: String): Unit =
    PartialsStore.sink(
      batch.groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
          .as("r")),
      batchId, path)

  /** The live q_conformal readout over the merged day-sum table. */
  def conformalFromPartials(spark: SparkSession, path: String)
      : DataFrame =
    graft.operators.Inference.conformalReadout(
      PartialsStore.mergedSums(spark, path, Seq("day"), Seq("r")))
}
