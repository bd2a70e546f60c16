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

  /** The live q_negbin_fit readout over the merged counts —
    * [[graft.operators.Inference.negbinReadout]], the ONE expression
    * tree both tiers share (bit-equality is structural). */
  def dispersionFromPartials(spark: SparkSession, path: String)
      : DataFrame =
    graft.operators.Inference.negbinReadout(
      PartialsStore.mergedSums(spark, path,
        Seq("event_type", "user_id"), Seq("x")))
}
