package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming decontamination screen: a STANDING heldout n-gram shingle
  * store that train-side batches are checked against ON INGEST — the
  * streaming twin of `q_prep_funnel`'s stage 5 (one-shot batch screen)
  * and a sibling of [[DedupStore]]'s signature-store plumbing. A 100 TB
  * pipeline cannot re-run the batch decontamination join every time new
  * training data arrives; it lands the eval/heldout suite's shingles
  * once, then screens each incoming batch in O(batch) against the
  * standing store.
  *
  * == Semantics ==
  * A train doc is CONTAMINATED iff any of its n-gram (default 8-token)
  * shingles appears in the heldout store — exactly the funnel's stage-5
  * rule (long grams are verbatim leakage; short grams are common
  * phrases, measured at `q_prep_funnel`), so screening k ingest batches
  * keeps exactly the docs the one-shot screen keeps (no cross-batch
  * state beyond the store itself — the screen is per-doc, order-free).
  *
  * == Store layout ==
  * {{{
  * path/grams/batch_id=N/pfx=P/   (h8)   — md5 of each heldout shingle
  * }}}
  * Heldout appends ride [[DedupStore]]'s dynamic-overwrite recipe
  * (replay replaces, never duplicates); duplicate grams across heldout
  * batches are harmless (the screen is a semi-join). `pfx = first
  * md5 byte mod numPfx` partitions the store so a broadcast batch side
  * lets dynamic partition pruning skip gram directories the batch never
  * hashes into — the [[DedupStore.candidatesVsStore]] shape.
  *
  * == 100 TB shapes ==
  * The standing side is scanned (one narrow md5 column), never
  * shuffled: the batch's shingles broadcast into the semi-join. The
  * heldout suite is eval-sized (millions of grams, not corpus-sized),
  * so the broadcast-threshold concern of [[DedupStore]] does not arise
  * on the batch side either way; `broadcastBatch=false` falls back to a
  * sort-merge screen for pathological batch sizes. */
object DecontamStore {

  private def metaPath(path: String) = s"$path/store_meta.txt"

  private def metaKv(n: Int, numPfx: Int): Seq[(String, String)] =
    Seq("n" -> n.toString, "numPfx" -> numPfx.toString)

  /** n-gram md5 shingles: (idCol, h8, pfx). */
  private def grams(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, numPfx: Int): DataFrame =
    docs.select(col(idCol), graft.Fns.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col(idCol), explode(expr(
        s"transform(sequence(1, size(__toks)-${n - 1}), " +
          s"i -> concat_ws(' ', slice(__toks, i, $n)))")).as("__sg"))
      .select(col(idCol), md5(col("__sg")).as("h8")).distinct()
      .withColumn("pfx",
        pmod(conv(substring(col("h8"), 1, 2), 16, 10), lit(numPfx))
          .cast("int"))

  /** Land one heldout batch's distinct n-gram shingles into the standing
    * store (replay-idempotent: dynamic overwrite keyed by `batchId`).
    * Returns the number of gram rows written.
    *
    * `autoCompactAfter > 0` makes maintenance self-driving (VERDICT r10
    * ask #3): when more than that many uncompacted source partitions
    * exist after the append, [[compactStore]] runs with
    * `upToBatchId = batchId - 1` — the id just appended stays
    * replayable, everything older consolidates. Screens are unchanged
    * by the pass (semi-join semantics). */
  def appendHeldout(
      docs: DataFrame,
      batchId: Long,
      path: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8,
      numPfx: Int = 16,
      autoCompactAfter: Int = 0): Long = {
    StoreLayout.checkOrWriteMeta(docs.sparkSession, metaPath(path),
      metaKv(n, numPfx))
    require(
      !StoreLayout.effectiveCompacted(docs.sparkSession, path,
        Seq(s"$path/grams")).contains(batchId),
      s"heldout batch $batchId was compacted into a generation; use a " +
        "fresh batch id")
    val g = grams(docs, idCol, textCol, n, numPfx)
      .select(col("h8"), col("pfx")).distinct()
      .withColumn("batch_id", lit(batchId))
      .localCheckpoint()
    g.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "pfx")
      .option("compression", "snappy").parquet(s"$path/grams")
    if (autoCompactAfter > 0 &&
        StoreLayout.listBatchIds(docs.sparkSession, s"$path/grams")
          .count(_ >= -1L) > autoCompactAfter) {
      compactStore(docs.sparkSession, path, upToBatchId = batchId - 1)
      ()
    }
    g.count()
  }

  /** LAZY per-doc screen of a train batch against the standing store:
    * the input rows plus a `contaminated` flag. The standing grams side
    * is scanned once and never shuffled (batch grams broadcast; `pfx`
    * rides the join keys for DPP) — pinned in DecontamStoreSpec.
    * Screening with parameters differing from the store's is REFUSED
    * (a mismatched `n` or `numPfx` would silently miss every leak). */
  def screenBatch(
      docs: DataFrame,
      path: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8,
      numPfx: Int = 16,
      broadcastBatch: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    if (!StoreLayout.hasBatchData(spark, s"$path/grams"))
      return docs.withColumn("contaminated", lit(false))
    StoreLayout.checkMeta(spark, metaPath(path), metaKv(n, numPfx))
    val g0 = grams(docs, idCol, textCol, n, numPfx)
    val g = if (broadcastBatch) broadcast(g0) else g0
    val standing = StoreLayout.excludeCompacted(
        spark.read.parquet(s"$path/grams"),
        StoreLayout.effectiveCompacted(spark, path,
          Seq(s"$path/grams")).keySet)
      .select(col("h8"), col("pfx"))
    val contaminated = standing.join(g, Seq("pfx", "h8"))
      .select(col(idCol)).distinct()
      .withColumn("__hit", lit(true))
    docs.join(contaminated, Seq(idCol), "left")
      .withColumn("contaminated", coalesce(col("__hit"), lit(false)))
      .drop("__hit")
  }

  /** Continuous decontaminated ingest: each micro-batch of `docs` (a
    * STREAMING DataFrame) is screened against the standing heldout store
    * and its SURVIVORS land exactly-once under
    * `survivorsPath/batch_id=N` (dynamic overwrite + checkpoint — the
    * [[DedupStore.docSink]] recipe). Contaminated docs are dropped, not
    * landed. The heldout store may keep growing between micro-batches
    * (new eval suites via [[appendHeldout]]); each batch screens against
    * the store as of its own execution. */
  /** Store lifecycle: consolidates every heldout gram partition with
    * `-1 <= batch_id <= upToBatchId` into one generation partition
    * (`grams/batch_id=G/pfx=P`, sorted by h8) and deletes the sources —
    * [[DedupStore.compactStore]]'s single-table sibling; same crash
    * safety (the screen is a semi-join, so the generation/source
    * coexistence window cannot change any verdict) and the same
    * replay fence (a compacted heldout batch id is refused forever).
    * Returns None when fewer than two source partitions qualify. */
  def compactStore(
      spark: SparkSession,
      path: String,
      upToBatchId: Long,
      targetFileBytes: Long = 128L * 1024 * 1024)
      : Option[DedupStore.CompactionResult] = {
    val all = StoreLayout.listBatchIds(spark, s"$path/grams")
    val log = StoreLayout.compactedIds(spark, path)
    // heal the rename-to-log crash window from the generation manifests
    // (single table, so a present generation is always a complete pass)
    val man = StoreLayout.manifestIds(spark, s"$path/grams")
    man.filter { case (src, _) => !log.contains(src) }
      .groupBy(_._2).foreach { case (gen, m) =>
        StoreLayout.recordCompaction(spark, path, gen, m.keys.toSeq.sorted)
      }
    val known = log ++ man
    StoreLayout.deleteBatchDirs(spark, s"$path/grams",
      all.filter(known.contains))
    val ids = all
      .filter(id => id >= -1L && id <= upToBatchId && !known.contains(id))
      .sorted
    if (ids.size < 2) None
    else {
      val genId = (all.filter(_ < -1L) ++ known.values.toSeq :+ -1L)
        .min - 1L
      StoreLayout.compactTable(spark, path, "grams", ids, genId,
        Seq("pfx"), Seq("h8"), targetFileBytes)
      StoreLayout.recordCompaction(spark, path, genId, ids)
      StoreLayout.deleteBatchDirs(spark, s"$path/grams", ids)
      Some(DedupStore.CompactionResult(genId, ids))
    }
  }

  def ingestSink(
      docs: DataFrame,
      storePath: String,
      survivorsPath: String,
      checkpointDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8,
      numPfx: Int = 16,
      unbounded: Boolean = false,
      broadcastBatch: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        screenBatch(batch, storePath, idCol, textCol, n, numPfx,
          broadcastBatch)
          .filter(!col("contaminated")).drop("contaminated")
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .option("compression", "snappy").parquet(survivorsPath)
        ()
      }
      .option("checkpointLocation", checkpointDir)
    (if (unbounded) w
     else w.trigger(
       org.apache.spark.sql.streaming.Trigger.AvailableNow())).start()
  }
}
