package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming DRIFT monitor — the fourth stored-partials monitor
  * (after [[EvalStream]], [[AnomalyStream]], [[ExperimentStream]]) and
  * the first written ON TOP of the extracted [[PartialsStore]]
  * scaffold: the whole monitor is the two domain statements below —
  * what the per-batch sufficient statistics are (per-(half, bin) value
  * counts) and what the readout expression is (the live `q_psi`
  * Laplace-smoothed PSI over 10 fixed-width bins) — with zero sink or
  * rollup plumbing of its own.
  *
  * Contract difference vs the batch `q_psi` (stated): the batch query
  * derives its reference/current split from the global min day + 14,
  * which an unordered stream cannot know; the monitor takes the split
  * day as an explicit parameter (what a deployed drift alarm does
  * anyway — "reference = launch fortnight" is an ops decision, not a
  * data-derived one). DriftStreamSpec feeds the batch query's own
  * derived cutoff back in and pins the streamed PSI BIT-EQUAL to live
  * `q_psi` — counts are exact integers under any batch slicing, and
  * the readout is the same frozen-log expression tree.
  *
  * At 100 TB the partials table grows ≤ 20 rows per micro-batch
  * (2 halves × 10 bins); the PSI readout scans kilobytes. */
object DriftStream {

  /** Per-batch (half, bin)-grain counts: half = 'p' (reference, day <=
    * cutoff) or 'q' (current); bin = the q_psi fixed-width value bin.
    * Replay-idempotent via [[PartialsStore.sink]]. */
  def binPartials(batch: DataFrame, batchId: Long, path: String,
      cutoff: String): Unit =
    PartialsStore.sink(
      batch.filter(col("value").isNotNull)
        .select(
          when(to_date(col("ts")) <= lit(cutoff), "p").otherwise("q")
            .as("half"),
          least(greatest(floor(col("value") / 50.0).cast("bigint"),
            lit(0L)), lit(9L)).as("bin"))
        .groupBy(col("half"), col("bin")).agg(count(lit(1)).as("n")),
      batchId, path)

  /** PSI over all stored batches — the live q_psi expression tree
    * (10 fixed bins, Laplace +0.5 smoothing, 9-dp frozen log terms,
    * exact decimal sum) over re-summed counts. */
  def psiFromPartials(spark: SparkSession, path: String): DataFrame = {
    val c = PartialsStore.mergedSums(spark, path,
      Seq("half", "bin"), Seq("n"))
    val bins = spark.range(0, 10).select(col("id").as("bin"))
    val tp = c.filter(col("half") === "p").agg(sum(col("n")).as("np"))
    val tq = c.filter(col("half") === "q").agg(sum(col("n")).as("nq"))
    broadcast(bins)
      .join(c.filter(col("half") === "p")
        .select(col("bin"), col("n").as("cp")), Seq("bin"), "left")
      .join(c.filter(col("half") === "q")
        .select(col("bin"), col("n").as("cq")), Seq("bin"), "left")
      .crossJoin(broadcast(tp)).crossJoin(broadcast(tq))
      .select(
        ((coalesce(col("cp"), lit(0L)) + 0.5) / (col("np") + 5.0))
          .as("pp"),
        ((coalesce(col("cq"), lit(0L)) + 0.5) / (col("nq") + 5.0))
          .as("qq"))
      .select(round((col("pp") - col("qq")) * log(col("pp") / col("qq")),
        9).cast("decimal(20,9)").as("term"))
      .agg(count(lit(1)).as("n_bins"), sum(col("term")).as("tsum"))
      .select(col("n_bins"),
        round(col("tsum").cast("double"), 6).as("psi"))
  }
}
