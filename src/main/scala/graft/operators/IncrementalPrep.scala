package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The pretraining-prep funnel as an EXACTLY-ONCE INCREMENTAL pipeline —
  * the standing-store composition of everything `q_prep_funnel` proves in
  * one batch plan: per ingest batch, (1) exact dedup against a persisted
  * fingerprint ledger, (2) length + language gates, (3) near-dup drop
  * against [[DedupStore]]'s banded signature store, (4) deterministic
  * train/heldout split with heldout shingles landed into
  * [[DecontamStore]], (5) decontamination screen, and — when a fitted
  * [[DsirSelect]] model is supplied — (6) DSIR data selection against
  * the frozen importance table, survivors landed under
  * `train/batch_id=N`. Every store append and the train landing use the
  * dynamic-overwrite replay-idempotent recipe, so a failed batch retries
  * cleanly end to end.
  *
  * == Batch ≡ incremental ==
  * Stages 1–4 are order-invariant for idCol-ordered batches (first-wins
  * fingerprints; [[DedupStore]]'s "near-dup of anything seen" rule). The
  * stage-5 screen is MONOTONE in the heldout store — per-batch screening
  * against the store-so-far only ever drops docs the full screen would
  * also drop — so the cheap early screen per batch plus ONE
  * [[finalizeScreen]] pass once the heldout side is complete yields
  * EXACTLY the one-shot batch result regardless of how train and heldout
  * docs interleave across batches (IncrementalPrepSpec). Production
  * shape: eval suites usually land before training ingest, making
  * finalize a cheap formality; when they trail, it is one linear pass
  * over landed survivors, never a funnel re-run.
  *
  * == 100 TB shapes ==
  * Per batch, every standing side (fingerprint ledger, signature store,
  * gram store) is SCANNED, never shuffled: batch-sized sides broadcast
  * into the probes ([[DedupStore.candidatesVsStore]]'s shape), and all
  * appends touch only the batch's own partitions. Nothing in the batch
  * path is O(corpus) except narrow standing scans. */
object IncrementalPrep {

  /** Per-batch yield accounting, one count per funnel stage.
    * `nSelectDropped` (stage 6, appended last for source compatibility)
    * counts screen survivors the DSIR selector rejected; 0 when no
    * selection model is configured. */
  final case class BatchStats(
      batchId: Long,
      nIn: Long,
      nExactDropped: Long,
      nGateDropped: Long,
      nNearDupDropped: Long,
      nHeldout: Long,
      nScreenDropped: Long,
      nLanded: Long,
      nSelectDropped: Long = 0L)

  /** q_prep_funnel's stage-1 fingerprint: whitespace-normalized lowered
    * text. */
  private def fpCol: org.apache.spark.sql.Column =
    md5(regexp_replace(lower(col("text")), "\\s+", " "))

  /** Ingest one idCol-ordered batch through the full funnel. `docs` must
    * carry (`doc_id`, `lang`, `text`). Bootstrap with `batchId = -1`
    * (the [[DedupStore]]/[[IvfIndex]] convention). */
  def ingestBatch(
      docs: DataFrame,
      batchId: Long,
      root: String,
      params: DedupStore.Params = DedupStore.Params(threshold = 0.7),
      minTokens: Int = 20,
      langs: Seq[String] = Seq("en", "zh", "de"),
      heldoutBucket: Int = 80,
      selectModelPath: Option[String] = None,
      selectMinAvgMicro: Long = 0L): BatchStats = {
    val spark = docs.sparkSession
    val base = docs.select(col("doc_id"), col("lang"), col("text"))
      .withColumn("fp", fpCol)
      .withColumn("n_tokens",
        size(graft.Fns.tokens(col("text"))).cast("long"))
      .localCheckpoint() // one materialization serves all stage counts
    val nIn = base.count()

    // stage 1a: intra-batch exact dedup, first (smallest id) wins
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val intra = base.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // stage 1b: vs the standing fingerprint ledger — the ledger is
    // scanned, not shuffled: batch fps broadcast in to find hits, the
    // (small) hit set broadcasts back into the anti-join
    val ledger = s"$root/fps"
    val afterExact =
      if (!StoreLayout.hasBatchData(spark, ledger)) intra
      else {
        val hits = spark.read.parquet(ledger)
          .filter(col("batch_id") =!= batchId)
          .join(broadcast(intra.select(col("fp"))), Seq("fp"))
          .select(col("fp")).distinct()
        intra.join(broadcast(hits), Seq("fp"), "left_anti")
      }
    // first-seen fingerprints enter the ledger (dropped dups' fps are
    // already present via their keepers)
    afterExact.select(col("fp")).distinct()
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .option("compression", "snappy").parquet(ledger)
    val nAfterExact = afterExact.count()

    // stage 2+3: length and language gates (stateless)
    val gated = afterExact
      .filter(col("n_tokens") >= minTokens && col("lang").isin(langs: _*))
      .localCheckpoint()
    val nGated = gated.count()

    // stage 4: near-dup against the standing signature store; this
    // batch's kept set comes back from the store's own flags
    DedupStore.appendBatch(gated, batchId, s"$root/dedup",
      params = params)
    val keptIds = spark.read.parquet(s"$root/dedup/sigs")
      .filter(col("batch_id") === batchId && col("kept"))
      .select(col("doc_id"))
    val s4 = gated.join(broadcast(keptIds), Seq("doc_id"))
      .withColumn("bucket",
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8),
          16, 10), lit(100)))
    val nS4 = s4.count()

    // stage 5: heldout-side shingles land in the standing gram store
    // FIRST (so same-batch leakage is caught), then the train side is
    // screened against the store as of now; finalizeScreen() settles
    // heldout that arrives in later batches
    val held = s4.filter(col("bucket") >= heldoutBucket)
    val nHeld = held.count()
    if (nHeld > 0)
      DecontamStore.appendHeldout(held, batchId, s"$root/decontam")
    val screened = DecontamStore
      .screenBatch(s4.filter(col("bucket") < heldoutBucket),
        s"$root/decontam")
      .filter(!col("contaminated"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("text"))

    // stage 6 (optional): DSIR selection against the frozen importance
    // model — per-doc and stateless given the model, so replay and
    // batch-split invariance come for free ([[DsirSelect]]'s rule)
    val (survivors, nScreened) = selectModelPath match {
      case None =>
        val s = screened.withColumn("batch_id", lit(batchId))
          .localCheckpoint()
        (s, -1L)
      case Some(mp) =>
        val scr = screened.localCheckpoint()
        val n5 = scr.count()
        val s = DsirSelect.selectBatch(scr, mp, selectMinAvgMicro)
          .filter(col("selected"))
          .select(col("doc_id"), col("lang"), col("n_tokens"), col("text"))
          .withColumn("batch_id", lit(batchId))
          .localCheckpoint()
        (s, n5)
    }
    survivors.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .option("compression", "snappy").parquet(s"$root/train")
    val nLanded = survivors.count()
    val nSelDropped = if (nScreened < 0) 0L else nScreened - nLanded
    val nScreenDropped =
      nS4 - nHeld - (if (nScreened < 0) nLanded else nScreened)

    BatchStats(batchId, nIn, nIn - nAfterExact, nAfterExact - nGated,
      nGated - nS4, nHeld, nScreenDropped, nLanded, nSelDropped)
  }

  /** The settlement pass: re-screen every landed survivor against the
    * now-complete heldout store and return the FINAL train table (lazy).
    * Monotone screening makes this exact: early per-batch screens only
    * dropped docs the full screen drops too, so landed ∖ late-flagged ==
    * the one-shot batch screen's survivors. One linear pass over the
    * train table; the gram store is scanned, never shuffled. */
  def finalizeScreen(spark: SparkSession, root: String): DataFrame =
    DecontamStore.screenBatch(
        spark.read.parquet(s"$root/train"), s"$root/decontam")
      .filter(!col("contaminated")).drop("contaminated")

  /** Continuous funnel ingest: each micro-batch runs [[ingestBatch]]
    * exactly-once (foreachBatch id + dynamic overwrite + checkpoint).
    * Run [[finalizeScreen]] after the heldout side is complete. */
  def sink(
      docs: DataFrame,
      root: String,
      checkpointDir: String,
      params: DedupStore.Params = DedupStore.Params(threshold = 0.7),
      minTokens: Int = 20,
      langs: Seq[String] = Seq("en", "zh", "de"),
      heldoutBucket: Int = 80,
      unbounded: Boolean = false,
      selectModelPath: Option[String] = None,
      selectMinAvgMicro: Long = 0L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, root, params, minTokens, langs,
          heldoutBucket, selectModelPath, selectMinAvgMicro)
        ()
      }
      .option("checkpointLocation", checkpointDir)
    (if (unbounded) w
     else w.trigger(
       org.apache.spark.sql.streaming.Trigger.AvailableNow())).start()
  }
}
