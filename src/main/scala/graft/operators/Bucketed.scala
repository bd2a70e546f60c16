package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables — the PRE-SHUFFLED layout that makes repeated joins
  * and aggregations on a key shuffle-free, and the one Spark-native
  * scale lever the engine had demonstrated only by `repartition` so
  * far. `bucketBy(n, key)` at write time hash-partitions rows into n
  * buckets per the same hash a shuffle would use and records the spec
  * in the catalog; every later equi-join or groupBy on the key between
  * same-bucketed tables then runs WITHOUT an Exchange on either side —
  * the shuffle was paid once, at write, and amortizes over every
  * subsequent query.
  *
  * The 100 TB economics: a fact table joined daily against its
  * dimensions pays its O(data) shuffle once instead of per query; two
  * co-bucketed fact tables (orders x lineitem on orderkey) join
  * map-side forever. Bucket count is the write-time knob that replaces
  * `spark.sql.shuffle.partitions` for these plans — size it so a
  * bucket fits an executor (buckets ~ data / 128 MB). The trade:
  * bucketed tables live in the catalog (`saveAsTable`, not bare
  * parquet paths), and both sides must agree on (key, n).
  *
  * This is the ONE bucketing module (the former `graft.io.Bucketing`
  * duplicate was consolidated here in round 9 — same feature had been
  * implemented twice with neither module referencing the other).
  * `XmlPipeline.process` exposes the lever on the reference-derived
  * path via its `bucketFact` knob (fact bucketed by the busiest dim
  * key).
  *
  * BucketedSpec pins the contract on live plans: zero
  * `Exchange hashpartitioning` in the co-located join AND in the
  * on-key groupBy, while the plain path-based join of the same data
  * shows the shuffles — with row-identical results.
  */
object Bucketed {

  /** Persist `df` as a managed parquet table bucketed (and
    * within-file sorted) on `key`. Overwrites. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables on `key` — merge-hinted so the
    * plan demonstrates the shuffle-free sort-merge join even when one
    * side is small enough to broadcast (a broadcast would ALSO avoid
    * the shuffle, but only below the size threshold; the bucketed SMJ
    * is the shape that survives two 50 TB sides). */
  def coLocatedJoin(
      spark: SparkSession, left: String, right: String, key: String)
      : DataFrame =
    spark.table(left).hint("merge").join(spark.table(right), key)

  /** True when the executed plan of `df` contains no shuffle exchange —
    * the property bucketed co-located joins are meant to buy. Shared
    * assertion helper for specs and plan audits. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString
      .contains("Exchange hashpartitioning")
}
