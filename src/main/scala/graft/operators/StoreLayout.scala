package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Shared plumbing for the standing-store modules ([[DedupStore]],
  * [[DecontamStore]]): batch-partitioned-data presence probe, the
  * parameter-metadata file that makes mismatched append/screen
  * parameters a loud refusal instead of a silent miss, and the
  * GENERATION COMPACTION machinery that keeps a daily-cadence store from
  * degrading into thousands of tiny `batch_id=N` directories.
  *
  * == Compaction model ==
  * A compaction pass rewrites the rows of a chosen set of source batch
  * partitions into ONE consolidated "generation" partition whose id is
  * NEGATIVE below -1 (-2, -3, ... — outside both foreachBatch's 0-based
  * replayable id space and the -1 bootstrap convention), then deletes the
  * sources. The pass is crash-safe without a transaction because standing-
  * store READ semantics are duplicate-insensitive (dedup candidates are
  * `.distinct()`ed, decontamination is a semi-join), so the window where
  * generation and source rows coexist changes no screen/dedup verdict;
  * `compaction_log.txt` records which source ids belong to which
  * generation so (a) an interrupted deletion is finished by the next pass,
  * (b) readers exclude logged-but-not-yet-deleted sources, and (c) appends
  * REFUSE a logged batch id — a replay of a compacted batch can no longer
  * exclude its own rows from the standing side, so it must not run.
  *
  * The log alone leaves one crash window (ADVICE r10): [[compactTable]]
  * renames the generation into place BEFORE [[recordCompaction]] writes
  * the log, so a crash between the two leaves generation AND sources
  * visible with nothing recording their relationship — harmless for
  * duplicate-insensitive screens, but a duplicate-SENSITIVE reader
  * ([[IvfIndex]]'s top-k search) would return doubled hits until a
  * compaction pass happens to re-run. Closed by a per-generation
  * MANIFEST: compactTable writes `_sources.txt` (same `gen=` line
  * format) INSIDE the generation directory before the rename, so the
  * instant a generation is visible its source list is too —
  * [[manifestIds]] recovers it, [[effectiveCompacted]] unions it with
  * the log for readers and append fences, and the next compaction pass
  * heals the log from it. */
private[operators] object StoreLayout {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True iff `dir` exists and holds at least one `batch_id=` partition. */
  def hasBatchData(spark: SparkSession, dir: String): Boolean = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    f.exists(p) &&
      f.listStatus(p).exists(_.getPath.getName.startsWith("batch_id="))
  }

  /** First caller writes `params` to `metaPath`; every later caller must
    * present the identical parameters or the call is refused — a store's
    * layout (hash counts, banding, partition prefixes) is fixed at
    * creation, and a quiet mismatch would make lookups silently miss. */
  def checkOrWriteMeta(
      spark: SparkSession,
      metaPath: String,
      params: Seq[(String, String)]): Unit = {
    val f = fs(spark, metaPath)
    val mp = new Path(metaPath)
    if (!f.exists(mp)) {
      val os = f.create(mp, false)
      os.write(params.map { case (k, v) => s"$k=$v" }
        .mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      os.close()
    } else {
      val in = f.open(mp)
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      in.close()
      val stored = bytes.toString("UTF-8").linesIterator
        .filter(_.contains("=")).map { l =>
          val Array(k, v) = l.split("=", 2); k -> v
        }.toSeq
      require(stored == params,
        s"store at $metaPath was built with ${stored.toMap}; " +
          s"refusing use with ${params.toMap}")
    }
  }

  /** Requires that a meta file exists and matches (read-side check for
    * callers that must not create one). */
  def checkMeta(
      spark: SparkSession,
      metaPath: String,
      params: Seq[(String, String)]): Unit = {
    require(fs(spark, metaPath).exists(new Path(metaPath)),
      s"no store metadata at $metaPath")
    checkOrWriteMeta(spark, metaPath, params)
  }

  /** `batch_id` partition values present under `dir` (empty if absent). */
  def listBatchIds(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
  }

  // underscore prefix: Spark's partition discovery ignores _-prefixed
  // entries, so the log may live INSIDE a partitioned table directory
  // (the IvfIndex layout, where the store root IS the table)
  private def logPath(storePath: String) =
    s"$storePath/_compaction_log.txt"

  private def readText(
      f: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = f.open(p)
    val bytes = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    var n = in.read(buf)
    while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
    in.close()
    bytes.toString("UTF-8")
  }

  /** Compacted source batch id -> generation id, from the store's
    * compaction log (empty if no compaction ever ran). Falls back to the
    * `.next` temp file when the main log is missing — the window of
    * [[recordCompaction]]'s delete-then-rename step. */
  def compactedIds(spark: SparkSession, storePath: String): Map[Long, Long] = {
    val f = fs(spark, storePath)
    val lp = new Path(logPath(storePath))
    val tp = new Path(logPath(storePath) + ".next")
    val text =
      if (f.exists(lp)) readText(f, lp)
      else if (f.exists(tp)) readText(f, tp)
      else ""
    text.linesIterator
      .filter(_.startsWith("gen=")).flatMap { l =>
        val Array(g, ids) = l.split(" ", 2)
        val gen = g.stripPrefix("gen=").toLong
        ids.stripPrefix("ids=").split(",").filter(_.nonEmpty)
          .map(_.toLong -> gen)
      }.toMap
  }

  /** Appends one `gen=<G> ids=a,b,c` line to the compaction log. The
    * rewrite goes through a `.next` temp file + rename (never a
    * truncate-in-place of the only copy): a torn in-place rewrite could
    * LOSE history, silently re-opening compacted batch ids for appends
    * that would duplicate their rows against the generation. At every
    * crash point at least one complete copy exists; [[compactedIds]]
    * reads `.next` when the main file is mid-swap. */
  def recordCompaction(
      spark: SparkSession, storePath: String,
      genId: Long, ids: Seq[Long]): Unit = {
    val f = fs(spark, storePath)
    val lp = new Path(logPath(storePath))
    val tp = new Path(logPath(storePath) + ".next")
    val prior = if (f.exists(lp)) readText(f, lp) else ""
    val os = f.create(tp, true)
    os.write((prior + s"gen=$genId ids=${ids.mkString(",")}\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    os.close()
    if (f.exists(lp)) f.delete(lp, false)
    require(f.rename(tp, lp), s"rename $tp -> $lp failed")
  }

  /** Compacted source batch id -> generation id recovered from the
    * `_sources.txt` manifests inside a TABLE's generation directories
    * (`batch_id=G` with G < -1). Covers the rename-to-log crash window:
    * a generation present on disk is authoritative about its sources
    * even when the log write never happened. Underscore prefix keeps
    * the file invisible to Spark's file listing. */
  def manifestIds(spark: SparkSession, tableDir: String): Map[Long, Long] = {
    val f = fs(spark, tableDir)
    val p = new Path(tableDir)
    if (!f.exists(p)) Map.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
      .filter(_ < -1L)
      .flatMap { gen =>
        val mp = new Path(s"$tableDir/batch_id=$gen/_sources.txt")
        if (!f.exists(mp)) Seq.empty
        else readText(f, mp).linesIterator
          .filter(_.startsWith("gen=")).flatMap { l =>
            val Array(_, ids) = l.split(" ", 2)
            ids.stripPrefix("ids=").split(",").filter(_.nonEmpty)
              .map(_.toLong -> gen)
          }.toSeq
      }.toMap
  }

  /** The union a READER or APPEND FENCE must consult: log entries plus
    * every generation manifest of the store's table dirs. The log can
    * lag the manifests by exactly one crash window; the manifests can
    * never lag the log (the manifest is written before the generation
    * becomes visible, and generations are never deleted). */
  def effectiveCompacted(
      spark: SparkSession,
      storePath: String,
      tableDirs: Seq[String]): Map[Long, Long] =
    tableDirs.foldLeft(compactedIds(spark, storePath)) { (acc, td) =>
      acc ++ manifestIds(spark, td)
    }

  /** Deletes the listed `batch_id=N` partition directories of a table. */
  def deleteBatchDirs(
      spark: SparkSession, tableDir: String, ids: Seq[Long]): Unit = {
    val f = fs(spark, tableDir)
    ids.foreach(id => f.delete(new Path(s"$tableDir/batch_id=$id"), true))
  }

  /** Reader-side guard for the compaction crash window: drop rows of
    * source partitions already logged as compacted (their authoritative
    * copy lives in a generation; the dirs are normally already gone, so
    * this partition-column filter prunes to nothing). */
  def excludeCompacted(df: DataFrame, compacted: Set[Long]): DataFrame =
    if (compacted.isEmpty) df
    else df.filter(!col("batch_id").isin(compacted.toSeq: _*))

  /** Rewrites the rows of `ids`' partitions of `storePath/tableName` into
    * one `batch_id=<genId>` generation partition with ~`targetFileBytes`
    * files, range-clustered and sorted on `subPart ++ sortCols` (the
    * [[graft.io.Compaction]] recipe — bounded file count plus row-group
    * min/max selectivity). Writes to a sibling tmp dir, then renames the
    * generation into place (Spark refuses to overwrite a path it reads;
    * the rename is O(1) per directory). Idempotent: a re-run replaces
    * the same generation partition. */
  def compactTable(
      spark: SparkSession,
      storePath: String,
      tableName: String,
      ids: Seq[Long],
      genId: Long,
      subPart: Seq[String],
      sortCols: Seq[String],
      targetFileBytes: Long): Unit = {
    // tableName == "" means the store root IS the table (IvfIndex)
    val tableDir =
      if (tableName.isEmpty) storePath else s"$storePath/$tableName"
    val tmpDir = s"$storePath/_compact_tmp" +
      (if (tableName.isEmpty) "" else s"/$tableName")
    val f = fs(spark, tableDir)
    val bytes = ids.map { id =>
      val p = new Path(s"$tableDir/batch_id=$id")
      if (f.exists(p)) f.getContentSummary(p).getLength else 0L
    }.sum
    val nFiles =
      math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val cluster = (subPart ++ sortCols).map(col)
    spark.read.parquet(tableDir)
      .filter(col("batch_id").isin(ids: _*))
      .withColumn("batch_id", lit(genId))
      .repartitionByRange(nFiles, cluster: _*)
      .sortWithinPartitions(cluster: _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("batch_id" +: subPart: _*)
      .option("compression", "snappy")
      .parquet(tmpDir)
    val src = new Path(s"$tmpDir/batch_id=$genId")
    val dst = new Path(s"$tableDir/batch_id=$genId")
    if (f.exists(dst)) f.delete(dst, true)
    // an empty selection writes no partition dir — nothing to move
    if (f.exists(src)) {
      // per-generation manifest BEFORE the rename: the generation and
      // its source list become visible in the same atomic move, closing
      // the rename-to-log crash window for duplicate-sensitive readers
      val os = f.create(new Path(src, "_sources.txt"), true)
      os.write(s"gen=$genId ids=${ids.mkString(",")}\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      os.close()
      require(f.rename(src, dst), s"rename $src -> $dst failed")
    }
    f.delete(new Path(s"$storePath/_compact_tmp"), true)
  }
}
