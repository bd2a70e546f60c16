package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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
      targetFileBytes: Long = 128L * 1024 * 1024,
      mergeSchema: Boolean = false): Int = {
    // mergeSchema: a table grown by schema-evolution appends must be
    // read as the UNION schema or the rewrite silently drops evolved
    // columns (a plain parquet read takes one file's schema)
    val df = spark.read
      .option("mergeSchema", mergeSchema.toString).parquet(inputPath)
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

  /** Morton (Z-order) key over numeric columns: each column is min-max
    * bucketed to `bits` bits, then the bit planes are interleaved, so
    * sorting by the key clusters rows that are close in EVERY dimension
    * at once. A single-column sort gives perfect skipping on that column
    * and none on the others; Z-order gives ~√-quality skipping on BOTH of
    * two columns — the right layout when two independent predicates are
    * both common (e.g. user_id and event date). Bucket bounds ride the
    * plan as a broadcast 1-row aggregate — no driver collect, and the
    * whole key is built-in arithmetic (codegen, no UDF). */
  def zOrderKey(df: DataFrame, zCols: Seq[String], bits: Int = 8)
      : DataFrame = {
    require(zCols.nonEmpty && bits * zCols.size <= 62,
      s"${zCols.size} cols x $bits bits exceeds a long")
    val bounds = df.agg(
      lit(1).as("__one"),
      zCols.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))): _*)
    val n = zCols.size
    val maxBucket = (1L << bits) - 1
    def bucket(c: String): Column = {
      val span = greatest(col(s"__max_$c") - col(s"__min_$c"), lit(1e-300))
      least(floor((col(c).cast("double") - col(s"__min_$c")) / span *
        maxBucket), lit(maxBucket)).cast("long")
    }
    val z = zCols.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(bucket(c).bitwiseAND(lit(1L << i)), i), i * n + j)
      }.reduce(_ + _)
    }.reduce(_ + _)
    df.crossJoin(broadcast(bounds.drop("__one"))).withColumn("__z", z)
      .drop(zCols.map(c => Seq(s"__min_$c", s"__max_$c")).flatten: _*)
  }

  /** [[compact]] variant clustering files on a Z-order key over `zCols`
    * instead of a lexicographic sort — bounded file count plus multi-
    * dimensional min/max selectivity (measured in CompactionSpec). */
  def compactZ(
      spark: SparkSession,
      inputPath: String,
      outputPath: String,
      zCols: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val df = spark.read.parquet(inputPath)
    val bytes = sizeOf(df, inputPath)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    zOrderKey(df, zCols)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .parquet(outputPath)
    val out = new Path(outputPath)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(out).count(_.getPath.getName.endsWith(".parquet"))
  }
}
