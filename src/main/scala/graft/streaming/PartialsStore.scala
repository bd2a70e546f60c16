package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared stored-partials scaffold behind every streaming monitor
  * ([[EvalStream]], [[AnomalyStream]], [[ExperimentStream]]) and the
  * sketch/event partials in [[EventStream]] — extracted (VERDICT r11
  * stretch) so the next monitor is ~30 lines of domain statistics
  * instead of a fourth copy of the sink/rollup plumbing.
  *
  * The recipe, in two halves:
  *
  *  1. '''Exactly-once sink''' ([[sink]]): each micro-batch's partials
  *     land in their own `batch_id=` partition with DYNAMIC partition
  *     overwrite, so a replayed batch (foreachBatch's at-least-once
  *     re-delivery with the same epoch id) overwrites its own
  *     partition instead of appending duplicates — the standard
  *     end-to-end-exactly-once recipe for non-transactional stores.
  *  2. '''Associative rollup''' ([[mergedSums]]): partials must be
  *     sufficient statistics under SUM (counts, exact decimal/integer
  *     Σv and Σv², fixed vote batteries) so the merged table over any
  *     batch slicing equals a one-shot pass bit-for-bit. Readouts are
  *     then plain expression trees over kilobytes of merged rows —
  *     the corpus is never rescanned.
  *
  * At 100 TB the partials table grows one key-grain row set per batch
  * — bounded by the key domain, not event volume; `graft.io.Compaction`
  * consolidates `batch_id=` generations like the other standing stores.
  */
object PartialsStore {

  /** Write one micro-batch's partial rows into their own `batch_id=`
    * partition (dynamic overwrite → replay-idempotent). */
  def sink(partials: DataFrame, batchId: Long, path: String): Unit =
    partials.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  /** Re-sum stored partials to the key grain: `SUM` over every stat
    * column, grouped by `keys` (empty → one global row). This is the
    * one (key-domain-bounded) shuffle every rollup shares; it is exact
    * whenever each stat column is associative under SUM. */
  def mergedSums(spark: SparkSession, path: String,
      keys: Seq[String], stats: Seq[String]): DataFrame = {
    val df = spark.read.parquet(path)
    val sums = stats.map(c => sum(col(c)).as(c))
    if (keys.isEmpty) df.agg(sums.head, sums.tail: _*)
    else df.groupBy(keys.map(col): _*).agg(sums.head, sums.tail: _*)
  }
}
