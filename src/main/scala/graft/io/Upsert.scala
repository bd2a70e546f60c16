package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed upsert (MERGE) into a partitioned parquet table, rewriting ONLY
  * the partitions the update batch touches.
  *
  * The naive merge — read whole table, full-outer join, rewrite whole
  * table — is O(table) per batch and unusable at 100 TB. This one is
  * O(touched partitions): the update batch's distinct partition values
  * prune the existing-table scan (partition pruning on the read, since the
  * filter is on the partition column), the merge window runs over just
  * those partitions, and `partitionOverwriteMode=dynamic` swaps in exactly
  * the rewritten partition directories — untouched partition files are
  * never read or written (asserted byte-for-byte in UpsertSpec). Last
  * writer per key wins by `versionCol` (ties broken deterministically by
  * preferring the update over the incumbent).
  *
  * This is the public lakehouse copy-on-write pattern expressed with
  * nothing but Spark built-ins; a table format (Delta/Iceberg/Hudi) adds
  * snapshot isolation + file-level (not partition-level) rewrite, but the
  * partition-pruned plan shape is the same.
  */
object Upsert {

  /** Merge `updates` into the parquet table at `tablePath`, partitioned by
    * `partitionCol`. Rows match on `keyCols`; higher `versionCol` wins.
    * Returns the number of partitions rewritten. */
  def mergeByKey(
      spark: SparkSession,
      tablePath: String,
      updates: DataFrame,
      keyCols: Seq[String],
      partitionCol: String,
      versionCol: String): Int = {
    import org.apache.spark.sql.expressions.Window

    val touched = updates.select(col(partitionCol)).distinct()
    // partition values are few by construction (a batch touches a bounded
    // set of dates/tenants); the list itself stays plan-side via a join.
    val existing = spark.read.parquet(tablePath)
      .join(broadcast(touched), Seq(partitionCol), "left_semi")

    // updates outrank incumbents at equal version
    val merged = existing.withColumn("__rank_src", lit(0))
      .unionByName(updates.withColumn("__rank_src", lit(1)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(versionCol).desc, col("__rank_src").desc)))
      .filter(col("__rn") === 1)
      .drop("__rn", "__rank_src")

    val prev = spark.conf.getOption(
      "spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      merged.write
        .mode(SaveMode.Overwrite)
        .partitionBy(partitionCol)
        .option("compression", "snappy")
        .parquet(tablePath)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    touched.count().toInt
  }
}
