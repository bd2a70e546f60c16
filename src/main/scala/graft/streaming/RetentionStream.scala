package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming COHORT-RETENTION monitor — the eleventh stored-partials
  * monitor on the [[PartialsStore]] scaffold, and the first whose
  * readout derives a MIN (first-seen cohort day) from sum-merged
  * partials: per-batch partials are (user_id, day, n_events) presence
  * rows — sufficient statistics under SUM, so any batch slicing merges
  * to the identical presence set — and the cohort assignment
  * (min day per user) happens at READOUT over the merged table, never
  * in the sink. That ordering is what makes the monitor late-data
  * correct: an out-of-order batch carrying a user's EARLIER activity
  * re-assigns their cohort on the next readout, where a frozen
  * first-seen store would keep the wrong cohort forever.
  *
  * The readout is the batch `q_retention` expression tree over the
  * merged presence rows (cohort_day × day_offset × distinct active
  * users), so RetentionStreamSpec pins streamed ≡ live bit-for-bit.
  *
  * At 100 TB: partials grow by the batch's active (user_id, day) pairs
  * — bounded by the user × calendar domain, not event volume (a user
  * with a million events in a batch lands ONE row per active day);
  * `graft.io.Compaction` consolidates `batch_id=` generations like the
  * other standing stores. The readout shuffles the user-day presence
  * table on user_id — user-domain-bounded — and the retention matrix
  * itself is days² at most. */
object RetentionStream {

  /** Per-batch per-(user, day) presence counts. Replay-idempotent via
    * [[PartialsStore.sink]]'s dynamic partition overwrite. */
  def presencePartials(batch: DataFrame, batchId: Long,
      path: String): Unit =
    PartialsStore.sink(
      batch.select(col("user_id"), to_date(col("ts")).as("day"))
        .groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n")),
      batchId, path)

  /** Cohort retention matrix over all stored batches — the
    * `q_retention` tree: first-activity cohort per user (the min
    * derived HERE, over merged presence), day offset, distinct active
    * users. */
  def retentionFromPartials(spark: SparkSession,
      path: String): DataFrame = {
    val p = PartialsStore.mergedSums(spark, path,
      Seq("user_id", "day"), Seq("n"))
    val first = p.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    p.join(first, "user_id")
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("bigint")
          .as("day_offset"),
        col("user_id"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }
}
