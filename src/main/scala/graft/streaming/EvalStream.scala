package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming EVAL monitor — the stored-partials member for the eval tier
  * (the [[EventStream.sketchPartials]] recipe applied to attempt
  * streams): each micro-batch lands one row per task holding that
  * batch's sufficient statistics — attempt count, success count, and
  * the 8 per-answer vote counts (the fixed answer space makes votes a
  * conditional-sum battery, the q_fleiss_kappa trick) — in its own
  * `batch_id=` partition (dynamic overwrite → replay-idempotent, same
  * recipe as [[EventStream.writeBatchIdempotent]]). Every statistic is
  * ASSOCIATIVE, so the rollups never rescan attempts: pass@k over any
  * batch range is the q_pass_at_k estimator over summed (n, c), and the
  * majority vote is the argmax of summed vote counts. A task split
  * across arbitrarily many micro-batches converges to exactly the batch
  * answer — pinned by EvalStreamSpec against the LIVE q_pass_at_k
  * query, so if the attempt-field derivations ever drift from the
  * batch tier, the parity test fails.
  *
  * Contract difference vs q_majority_vote (stated): the streaming
  * monitor votes over ALL attempts seen, not the batch query's first-8
  * cut — "first 8 by global order" is not computable from unordered
  * micro-batches without storing per-task order state; the uncapped
  * mode is, and is what a live monitor wants anyway.
  *
  * At 100 TB the partials table grows one task-grain row set per batch;
  * `graft.io.Compaction` consolidates `batch_id=` generations exactly
  * as for the other standing stores.
  */
object EvalStream {

  /** md5-derived attempt fields — MUST match the q_pass_at_k /
    * q_majority_vote derivations (parity-pinned by EvalStreamSpec). */
  private def hash8(c: Column): Column =
    pmod(conv(substring(md5(c.cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(8L))

  private[graft] def okCol(eventId: Column): Column =
    (pmod(conv(substring(md5(eventId.cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(5L)) === 0L).cast("long")

  private[graft] def ansCol(eventId: Column, userId: Column): Column =
    when(pmod(conv(substring(md5(eventId.cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(3L)) === 0L, hash8(userId))
      .otherwise(hash8(eventId))

  /** Per-batch task-grain sufficient statistics, replay-idempotent. */
  def evalPartials(batch: DataFrame, batchId: Long, path: String): Unit = {
    val votes = (0 to 7).map(a =>
      sum(when(ansCol(col("event_id"), col("user_id")) === a.toLong, 1L)
        .otherwise(0L)).as(s"v$a"))
    PartialsStore.sink(
      batch
        .groupBy(col("user_id").as("task"))
        .agg(count(lit(1)).as("n"),
          sum(okCol(col("event_id"))).as("c") +: votes: _*),
      batchId, path)
  }

  /** Merged task-grain statistics over all stored batches — the one
    * shuffle every rollup shares. */
  private def merged(spark: SparkSession, path: String): DataFrame =
    PartialsStore.mergedSums(spark, path, Seq("task"),
      Seq("n", "c") ++ (0 to 7).map(a => s"v$a"))

  /** pass@k over the stored partials — the q_pass_at_k estimator
    * (unbiased 1 - C(n-c,k)/C(n,k), per-task micro freeze, same n>=10
    * qualification) computed without rescanning a single attempt. */
  def passAtKFromPartials(spark: SparkSession, path: String): DataFrame = {
    merged(spark, path)
      .filter(col("n") >= 10L)
      .select(col("task"), col("n"), col("c"),
        explode(array(lit(1), lit(5), lit(10))).as("k"))
      .withColumn("p6", expr(
        "CAST(round((CASE WHEN n - c < k THEN CAST(1.0 AS DOUBLE) " +
          "ELSE CAST(1.0 AS DOUBLE) - aggregate(sequence(0, k - 1), " +
          "CAST(1.0 AS DOUBLE), (acc, i) -> acc * " +
          "(CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE))) " +
          "END) * 1000000.0, 0) AS BIGINT)"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_tasks"),
        expr("CAST(round(CAST(SUM(p6) AS DOUBLE) / " +
          "CAST(COUNT(*) AS DOUBLE), 0) AS BIGINT)")
          .as("mean_pass_micro"))
      .orderBy(col("k"))
  }

  /** Uncapped majority vote over the stored partials: per task, the
    * argmax of the summed vote counts (ties break to the smallest
    * answer — the q_majority_vote tie-break) against the task's
    * md5-derived reference answer. */
  def voteFromPartials(spark: SparkSession, path: String): DataFrame = {
    val m = merged(spark, path)
    // fold the 8 fixed columns into (cnt, ans) structs and take the max:
    // struct ordering compares cnt first, then -ans, so the max struct
    // is the largest count with the SMALLEST answer on ties
    val candidates = (0 to 7).map(a =>
      struct(col(s"v$a").as("cnt"), lit(-a.toLong).as("nega")))
    m.select(col("task"),
        greatest(candidates: _*).getField("nega").as("nega"))
      .select(col("task"), (-col("nega")).as("mode_ans"))
      .withColumn("ref", hash8(col("task")))
      .agg(count(lit(1)).as("n_tasks"),
        sum((col("mode_ans") === col("ref")).cast("long")).as("n_correct"),
        expr("CAST(round(CAST(SUM(CAST(mode_ans = ref AS BIGINT)) " +
          "AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1000000.0, 0) " +
          "AS BIGINT)").as("acc_micro"))
  }
}
