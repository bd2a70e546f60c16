package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Small-file compaction — the operational counterpart of the scan-side
  * tuning in SCALE.md: a 100 TB table written by many tasks (or many
  * incremental batches, like XmlPipeline's appends) degrades into
  * thousands of KB-scale parquet files whose footer/open costs dominate
  * scans. Compaction rewrites to a target file size with
  * `repartitionByRange` on the given sort columns, which simultaneously:
  *  - bounds file count (ceil(bytes / targetFileBytes) output tasks),
  *  - clusters rows so parquet row-group min/max stats become selective
  *    (range-partitioned + sorted-within-file = data skipping on the sort
  *    key without any index).
  */
object Compaction {

  /** Estimated on-disk bytes of a parquet directory (or file). */
  def sizeOf(df: DataFrame, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  /** Rewrites `inputPath` to `outputPath` with ~`targetFileBytes` files,
    * range-clustered + sorted within files on `sortCols`. Returns the
    * output file count. */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      inputPath: String,
      outputPath: String,
      sortCols: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val df = spark.read.parquet(inputPath)
    val bytes = sizeOf(df, inputPath)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    df.repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .parquet(outputPath)
    val out = new Path(outputPath)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(out).count(_.getPath.getName.endsWith(".parquet"))
  }
}
