package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming EXPERIMENT monitor — the stored-partials twin of
  * `q_experiment_report` (the [[EvalStream]]/[[AnomalyStream]] recipe
  * applied to A/B readouts): each micro-batch lands ONE row holding the
  * batch's 18 exact sufficient statistics — per-arm counts and decimal
  * Σv/Σv² for the two-sample metrics, plus the four DiD cell moments —
  * in its own `batch_id=` partition (dynamic overwrite →
  * replay-idempotent). Every statistic is an exact decimal or integer
  * SUM, so the rollup is associative to the bit: after any batch
  * slicing, the merged statistics are IDENTICAL integers/decimals to a
  * one-shot pass, and the seven metric rows (Welch t/df, Cohen's d /
  * Hedges' g, mean diff, DiD + SE) are the live query's own expression
  * trees over them — pinned INTEGER-EQUAL against live
  * `q_experiment_report` by ExperimentStreamSpec, so the streamed
  * readout can never drift from the batch tier.
  *
  * At 100 TB the partials table grows ONE ROW per micro-batch;
  * `graft.io.Compaction` consolidates `batch_id=` generations exactly
  * as for the other standing stores. A dashboard polling
  * [[reportFromPartials]] reads kilobytes, not the corpus. */
object ExperimentStream {

  /** The 18 sufficient statistics — MUST mirror q_experiment_report's
    * derivations (parity-pinned by ExperimentStreamSpec). */
  private def stats(base: DataFrame): DataFrame = {
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    def sv(c: Column) = sum(when(c, col("v")))
    def sq(c: Column) = sum(when(c, col("v") * col("v")))
    val g1 = col("et") === "click"
    val g2 = col("et") === "error"
    def cell(t: Boolean, po: Boolean) = col("t") === t && col("po") === po
    base.agg(
      cnt(g1).as("n1"), sv(g1).as("s1"), sq(g1).as("q1"),
      cnt(g2).as("n2"), sv(g2).as("s2"), sq(g2).as("q2"),
      cnt(cell(false, false)).as("n00"), sv(cell(false, false)).as("s00"),
      sq(cell(false, false)).as("q00"),
      cnt(cell(false, true)).as("n01"), sv(cell(false, true)).as("s01"),
      sq(cell(false, true)).as("q01"),
      cnt(cell(true, false)).as("n10"), sv(cell(true, false)).as("s10"),
      sq(cell(true, false)).as("q10"),
      cnt(cell(true, true)).as("n11"), sv(cell(true, true)).as("s11"),
      sq(cell(true, true)).as("q11"))
  }

  private def prepared(batch: DataFrame): DataFrame =
    batch.select(col("event_type").as("et"),
      (pmod(col("user_id"), lit(2L)) === 1L).as("t"),
      (datediff(to_date(col("ts")), lit("2024-01-01")) >= 15).as("po"),
      col("value").cast(graft.Fns.D18_6).as("v"))

  /** Per-batch 1-row sufficient statistics, replay-idempotent. */
  def expPartials(batch: DataFrame, batchId: Long, path: String): Unit =
    PartialsStore.sink(stats(prepared(batch)), batchId, path)

  private val statCols = Seq("n1", "s1", "q1", "n2", "s2", "q2",
    "n00", "s00", "q00", "n01", "s01", "q01",
    "n10", "s10", "q10", "n11", "s11", "q11")

  /** The full 7-metric readout over all stored batches — the live
    * q_experiment_report expression trees over re-summed statistics
    * (exact decimal sums are associative, so the doubles match the
    * one-pass query bit-for-bit). */
  def reportFromPartials(spark: SparkSession, path: String): DataFrame = {
    val merged = PartialsStore.mergedSums(spark, path, Nil, statCols)
      // re-summing DECIMAL(28,6) widens to (38,6); the one-pass query
      // aggregates DECIMAL(18,6) inputs straight to (28,6) — normalize
      // so CAST(x AS DOUBLE) sees identical values either way
      .select(statCols.map(c => col(c).cast("decimal(38,6)").as(c)): _*)
    val mid = merged.select(col("n1"), col("n2"),
      expr("(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) - " +
        "CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))").as("md"),
      expr("((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * " +
        "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / " +
        "CAST(n1 - 1 AS DOUBLE)) / CAST(n1 AS DOUBLE)").as("se1"),
      expr("((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * " +
        "CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / " +
        "CAST(n2 - 1 AS DOUBLE)) / CAST(n2 AS DOUBLE)").as("se2"),
      expr("((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * " +
        "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) + " +
        "(CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * " +
        "CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))) / " +
        "CAST(n1 + n2 - 2 AS DOUBLE)").as("sp2"),
      expr("((CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE) - " +
        "CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE)) - " +
        "(CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE) - " +
        "CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE)))").as("did"),
      expr("sqrt(" +
        "(CAST(q00 AS DOUBLE) - CAST(s00 AS DOUBLE) * " +
        "CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE)) / " +
        "(CAST(n00 - 1 AS DOUBLE) * CAST(n00 AS DOUBLE)) + " +
        "(CAST(q01 AS DOUBLE) - CAST(s01 AS DOUBLE) * " +
        "CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE)) / " +
        "(CAST(n01 - 1 AS DOUBLE) * CAST(n01 AS DOUBLE)) + " +
        "(CAST(q10 AS DOUBLE) - CAST(s10 AS DOUBLE) * " +
        "CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE)) / " +
        "(CAST(n10 - 1 AS DOUBLE) * CAST(n10 AS DOUBLE)) + " +
        "(CAST(q11 AS DOUBLE) - CAST(s11 AS DOUBLE) * " +
        "CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE)) / " +
        "(CAST(n11 - 1 AS DOUBLE) * CAST(n11 AS DOUBLE)))").as("dse"))
    def m(name: String, v: String) =
      struct(lit(name).as("metric"),
        expr(s"CAST(round($v * 1000000.0, 0) AS BIGINT)")
          .as("value_micro"))
    mid.select(explode(array(
        m("cohens_d", "md / sqrt(sp2)"),
        m("did", "did"),
        m("did_se", "dse"),
        m("hedges_g", "md / sqrt(sp2) * (1.0 - 3.0 / " +
          "(4.0 * CAST(n1 + n2 AS DOUBLE) - 9.0))"),
        m("mean_diff", "md"),
        m("welch_df", "(se1 + se2) * (se1 + se2) / " +
          "(se1 * se1 / CAST(n1 - 1 AS DOUBLE) + " +
          "se2 * se2 / CAST(n2 - 1 AS DOUBLE))"),
        m("welch_t", "md / sqrt(se1 + se2)"))).as("r"))
      .select(col("r.metric").as("metric"),
        col("r.value_micro").as("value_micro"))
      .orderBy(col("metric"))
  }
}
