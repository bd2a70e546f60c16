package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming OVERDISPERSION monitor — the seventh stored-partials
  * monitor: per-batch (event_type, user_id) event counts (trivially
  * sum-associative), with the batch `q_negbin_fit` readout — zeros-
  * included per-user moments, dispersion index, NB size — recomputed
  * from the merged user-grain table. A fraud/bot alarm watches
  * exactly this: a dispersion index collapsing toward 1 means
  * machine-regular traffic displacing bursty humans, long before any
  * volume alarm fires.
  *
  * Contract vs the kilobyte monitors (stated): the partials here are
  * USER-GRAIN (O(active users) rows per batch, compacting to one row
  * per (type, user) under the merge), the standing-side-scanned-
  * never-shuffled store shape of DedupStore — not the 1-row
  * sufficient-statistic family. The distinct-user denominator is
  * derived from the same merged table (a user counts once however
  * many batches it spans), so the readout is BIT-EQUAL to live
  * `q_negbin_fit` under any batch slicing — pinned by
  * DispersionStreamSpec. */
object DispersionStream {

  /** Per-batch (event_type, user_id) counts. Replay-idempotent via
    * [[PartialsStore.sink]]. */
  def countPartials(batch: DataFrame, batchId: Long, path: String): Unit =
    PartialsStore.sink(
      batch.groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("x")),
      batchId, path)

  /** The live q_negbin_fit readout over the merged counts. */
  def dispersionFromPartials(spark: SparkSession, path: String)
      : DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val c = PartialsStore.mergedSums(spark, path,
      Seq("event_type", "user_id"), Seq("x"))
    val nu = c.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("nu"))
    val nbMean = "(CAST(sx AS DOUBLE) / CAST(nu AS DOUBLE))"
    val nbVar = s"(CAST(sxx AS DOUBLE) / CAST(nu AS DOUBLE) - " +
      s"$nbMean * $nbMean)"
    c.groupBy(col("event_type"))
      .agg(sum(col("x")).as("sx"),
        sum(col("x").cast(d38) * col("x").cast(d38)).as("sxx"))
      .crossJoin(broadcast(nu))
      .select(col("event_type"), col("nu").as("n_users"),
        expr(s"CAST(round($nbMean * 1000000.0, 0) AS BIGINT)")
          .as("mean_micro"),
        expr(s"CAST(round($nbVar * 1000000.0, 0) AS BIGINT)")
          .as("var_micro"),
        expr(s"CAST(round($nbVar / $nbMean * 1000000.0, 0) " +
          "AS BIGINT)").as("dispersion_micro"),
        expr(s"CASE WHEN $nbVar > $nbMean THEN CAST(round($nbMean * " +
          s"$nbMean / ($nbVar - $nbMean) * 1000000.0, 0) AS BIGINT) " +
          "ELSE CAST(0 AS BIGINT) END").as("r_micro"),
        expr(s"$nbVar > $nbMean").as("overdispersed"))
      .orderBy(col("event_type"))
  }
}
