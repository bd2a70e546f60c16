package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed table writes — the cluster-scale lever for repeated equi-joins
  * (SCALE.md): writing both sides bucketed (and sorted) by the join key
  * pre-shuffles the data ONCE at write time; every later join on that key
  * plans a sort-merge join with NO exchange on either side, which is the
  * difference between re-shuffling 100 TB per query and never shuffling it
  * again.
  *
  * Uses `bucketBy` + `saveAsTable` (bucket metadata lives in the catalog —
  * plain `parquet(path)` cannot carry it). Bucket count should target
  * ~128-256 MB per bucket file at the expected data size. */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w)
      .option("compression", "snappy")
      .format("parquet")
      .saveAsTable(table)
  }

  /** True when the executed plan of `df` contains no shuffle exchange —
    * the property bucketed co-located joins are meant to buy. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
