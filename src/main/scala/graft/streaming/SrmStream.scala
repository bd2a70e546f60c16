package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming SAMPLE-RATIO-MISMATCH gate — the fifth stored-partials
  * monitor, on the [[PartialsStore]] scaffold: per-batch exposure
  * counts per arm, and the batch `q_srm` chi-square readout with the
  * SAME exact-integer verdict (`(n0-n1)^2 * 1e6 > (n0+n1) * 3841459`,
  * the chi²(1, .95) fence cross-multiplied so no float touches the
  * decision). This is the gate a platform evaluates CONTINUOUSLY
  * while an experiment runs — a broken assignment should page within
  * a micro-batch, not at readout time.
  *
  * Contract difference vs the batch `q_srm` (stated): the batch query
  * counts DISTINCT users per arm, which is not sum-associative across
  * micro-batches; the monitor counts EXPOSURE EVENTS per arm — the
  * standard streaming SRM formulation (each delivery is a Bernoulli
  * draw under the 50/50 null). SrmStreamSpec pins k-batch ≡ one-shot
  * ≡ an independent plain-Scala recount, integer-exact, and shows a
  * planted 10% arm drop tripping the fence.
  *
  * At 100 TB the partials table grows ≤ 2 rows per micro-batch and
  * the readout scans kilobytes. */
object SrmStream {

  /** Per-batch exposure counts per arm (treated = odd user_id, the
    * house assignment). Replay-idempotent via [[PartialsStore.sink]]. */
  def armPartials(batch: DataFrame, batchId: Long, path: String): Unit =
    PartialsStore.sink(
      batch.select(pmod(col("user_id"), lit(2L)).as("arm"))
        .groupBy(col("arm")).agg(count(lit(1)).as("n")),
      batchId, path)

  /** Chi-square SRM verdict over all stored batches — the q_srm
    * expression tree over re-summed exact counts. */
  def srmFromPartials(spark: SparkSession, path: String): DataFrame = {
    val c = PartialsStore.mergedSums(spark, path, Seq("arm"), Seq("n"))
    c.agg(
      sum(when(col("arm") === 0L, col("n")).otherwise(0L)).as("n0"),
      sum(when(col("arm") === 1L, col("n")).otherwise(0L)).as("n1"))
      .select(col("n0"), col("n1"),
        expr("CAST(round(CAST(CAST(n0 - n1 AS DECIMAL(19,0)) * " +
          "CAST(n0 - n1 AS DECIMAL(19,0)) AS DOUBLE) / " +
          "CAST(n0 + n1 AS DOUBLE) * 1000000.0, 0) AS BIGINT)")
          .as("chi2_micro"),
        expr("CAST(n0 - n1 AS DECIMAL(19,0)) * " +
          "CAST(n0 - n1 AS DECIMAL(19,0)) * 1000000 > " +
          "CAST(n0 + n1 AS DECIMAL(19,0)) * 3841459").as("srm"))
  }
}
