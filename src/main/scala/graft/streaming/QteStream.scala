package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming quantile-treatment-effect monitor — the tenth
  * stored-partials monitor on the [[PartialsStore]] scaffold: per-batch
  * (arm, v2) grid counts on the centi-frozen value grid, and the batch
  * `q_qte` quartile readout over the merged table. Quantiles are NOT
  * sum-associative, but GRID COUNTS are — the same dissolution that
  * makes the batch query exact makes the stream exact: any batch
  * slicing merges to the one-shot grid bit-for-bit, and the type-1
  * quantile is a deterministic function of that grid
  * (MonitorSlicingProps). This is the always-on DISTRIBUTIONAL A/B
  * readout beside SrmStream's validity gate and ExperimentStream's
  * means — a treatment that moves the tails but not the center pages
  * here and nowhere else.
  *
  * Structural sharing: the readout IS
  * [[graft.operators.Inference.qteFromGridCounts]] — the live query's
  * own expression tree over the merged partials, so streamed QTEs are
  * bit-equal to `q_qte` over the same rows by construction.
  *
  * At 100 TB the partials table grows ≤ |value grid| rows per
  * micro-batch (bounded by the VALUE DOMAIN, never event volume) and
  * the readout scans kilobytes. */
object QteStream {

  /** Per-batch (arm, v2) grid counts (house A/B arms, centi-frozen
    * values). Replay-idempotent via [[PartialsStore.sink]]. */
  def gridPartials(batch: DataFrame, batchId: Long, path: String): Unit =
    PartialsStore.sink(
      batch.filter(col("value").isNotNull)
        .select(pmod(col("user_id"), lit(2L)).as("arm"),
          expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("v2"))
        .groupBy(col("arm"), col("v2")).agg(count(lit(1)).as("n")),
      batchId, path)

  /** Quartile QTEs over all stored batches — the q_qte expression tree
    * over the re-summed exact grid. */
  def qteFromPartials(spark: SparkSession, path: String): DataFrame =
    graft.operators.Inference.qteFromGridCounts(
      PartialsStore.mergedSums(spark, path, Seq("arm", "v2"), Seq("n")))
}
