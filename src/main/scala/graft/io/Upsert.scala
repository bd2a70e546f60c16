package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed upsert (MERGE) into a partitioned parquet table, rewriting ONLY
  * the partitions the update batch touches.
  *
  * The naive merge — read whole table, full-outer join, rewrite whole
  * table — is O(table) per batch and unusable at 100 TB. This one is
  * O(touched partitions): the update batch's distinct partition values
  * (collected — a batch touches a bounded set of dates/tenants by
  * contract) statically prune the existing-table scan, the merge window
  * runs over just those partitions, and the result is written to a
  * staging directory then swapped in per partition — untouched partition
  * files are never read or written (asserted byte-for-byte in
  * UpsertSpec). Last writer per key wins by `versionCol` (ties broken
  * deterministically by preferring the update over the incumbent).
  *
  * ==Atomicity==
  * NOT transactional. The merge is computed entirely against the ORIGINAL
  * table (the staging write consumes the read before any destination file
  * is touched), so a failure during the merge/staging phase leaves the
  * table byte-identical. The final swap is a per-partition
  * delete+rename: a crash inside the swap loop can leave a prefix of the
  * touched partitions on the new version and the rest on the old (and, in
  * the worst case, one partition missing between its delete and rename).
  * Re-running the same merge is idempotent and repairs that state as long
  * as the staging write re-derives from `updates`' original source (not
  * from `tablePath`). A table format (Delta/Iceberg/Hudi) buys snapshot
  * isolation + file-level rewrite; the partition-pruned plan shape here is
  * the same.
  */
object Upsert {

  /** Merge `updates` into the parquet table at `tablePath`, partitioned by
    * `partitionCol`. Rows match on `keyCols`; higher `versionCol` wins.
    * Key and partition values must be non-null. Returns the number of
    * partitions rewritten. */
  def mergeByKey(
      spark: SparkSession,
      tablePath: String,
      updates: DataFrame,
      keyCols: Seq[String],
      partitionCol: String,
      versionCol: String): Int = {
    import org.apache.spark.sql.expressions.Window

    // Materialize the touched-partition list up front (ADVICE r2): it is
    // small by contract, the literal IN-list gives static partition
    // pruning on the read (no DPP/AQE dependence), and nothing below
    // re-executes `updates`' lineage after the table changes.
    val touchedValues: Seq[Any] =
      updates.select(col(partitionCol)).distinct().collect().map(_.get(0)).toSeq
    if (touchedValues.isEmpty) return 0

    val existing = spark.read.parquet(tablePath)
      .filter(col(partitionCol).isin(touchedValues: _*))

    // updates outrank incumbents at equal version
    val merged = existing.withColumn("__rank_src", lit(0))
      .unionByName(updates.withColumn("__rank_src", lit(1)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(versionCol).desc, col("__rank_src").desc)))
      .filter(col("__rn") === 1)
      .drop("__rn", "__rank_src")

    // Stage next to the table (same filesystem → rename is a metadata op,
    // not a copy), under a dot-prefixed name parquet readers ignore.
    val table = new Path(tablePath)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(table.getParent,
      s".${table.getName}__graft_staging_${java.util.UUID.randomUUID()}")
    try {
      merged.write
        .mode(SaveMode.Overwrite)
        .partitionBy(partitionCol)
        .option("compression", "snappy")
        .parquet(staging.toString)

      // Swap in each staged partition dir. Enumerating the staging output
      // (rather than re-encoding partition values into paths) keeps the
      // value→dirname escaping logic entirely Spark's.
      val stagedParts = fs.listStatus(staging)
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith(s"$partitionCol="))
      stagedParts.foreach { st =>
        val dest = new Path(table, st.getPath.getName)
        if (fs.exists(dest)) fs.delete(dest, true)
        fs.rename(st.getPath, dest)
      }
      stagedParts.length
    } finally {
      fs.delete(staging, true)
    }
  }
}
