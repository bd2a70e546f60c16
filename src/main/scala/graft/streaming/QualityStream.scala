package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Text

/** Streaming QUALITY-MIX monitor — the eighth stored-partials monitor:
  * per-batch (lang, bucket) document counts under a CALIBRATION-FROZEN
  * scoring context (the add-1 bigram LM and the tercile thresholds,
  * both fixed when the monitor is armed), answering "is the incoming
  * corpus getting worse" from kilobytes — the production shape of
  * CCNet's perplexity split, where documents are always scored against
  * a FIXED reference LM, never the evolving stream.
  *
  * Contract difference vs the batch `q_ppl_bucket` (stated): the batch
  * query derives LM and terciles from the corpus it scores, which an
  * unbounded stream cannot (the LM would drift with the data it is
  * supposed to judge). The monitor takes both as [[Calibration]]
  * parameters; QualityStreamSpec feeds the batch query's own derived
  * LM + thresholds back in and pins the streamed mix BIT-EQUAL to live
  * `q_ppl_bucket` under any batch slicing — per-doc ce is computable
  * within one batch (documents never span batches), scoring and
  * bucketing share [[Text.pplCe]]/[[Text.pplBucketE]] with the live
  * query, and (lang, bucket) counts are exact integers under SUM.
  *
  * At 100 TB the partials table grows ≤ |langs| × 4 rows per
  * micro-batch; the mix readout scans kilobytes. Bigrams outside the
  * frozen LM drop in the score join (the frozen-LM contract — unknown
  * tokens are the reference LM's smoothing concern) — and since r14
  * that drop is OBSERVABLE, not just stated (r13 VERDICT Next #6):
  * every partial row carries `oov_mass` (bigrams of its docs the score
  * join discarded), documents with ZERO in-calibration bigrams land in
  * a fourth `unscored` bucket instead of vanishing, and
  * [[oovFromPartials]] reads the drift out per lang. [[mixFromPartials]]
  * excludes `unscored` so the pinned mix contract vs live
  * `q_ppl_bucket` (which also never sees such docs) is unchanged. */
object QualityStream {

  /** The frozen scoring context: the LM score table and the tercile
    * cut points, fixed when the monitor is armed. */
  final case class Calibration(scored: DataFrame, t1: Double, t2: Double)

  /** Train the scoring LM + terciles on a calibration corpus
    * (`doc_id`, `lang`, `text`) — [[Text.pplLm]] plus the live
    * query's percentile anchor, checkpointed so every later batch
    * scores against a static table instead of re-deriving it. */
  def calibrate(corpus: DataFrame): Calibration = {
    val scored = Text.pplLm(corpus).localCheckpoint()
    val th = Text.pplCe(corpus, scored).agg(
      expr("percentile(ce6, 0.3333333333333333)"),
      expr("percentile(ce6, 0.6666666666666666)"))
      .collect().head
    Calibration(scored, th.getDouble(0), th.getDouble(1))
  }

  /** Per-batch (lang, bucket) doc + bigram counts under the frozen
    * calibration, plus the OOV mass the score join dropped. The doc
    * grain left-joins total bigram counts against scored counts: a doc
    * whose every bigram is outside the calibration LM has no ce6 and
    * buckets as `unscored` (visible) instead of dropping (invisible).
    * Replay-idempotent via [[PartialsStore.sink]]. */
  def bucketPartials(batch: DataFrame, batchId: Long, path: String,
      cal: Calibration): Unit =
    PartialsStore.sink(
      Text.pplDocBigramCounts(batch)
        .join(Text.pplCe(batch, cal.scored)
          .select(col("doc_id"), col("n_bigrams"), col("ce6")),
          Seq("doc_id"), "left")
        .withColumn("t1", lit(cal.t1)).withColumn("t2", lit(cal.t2))
        .select(col("lang"),
          when(col("ce6").isNull, lit("unscored"))
            .otherwise(expr(Text.pplBucketE)).as("bucket"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          (col("tot_bigrams") - coalesce(col("n_bigrams"), lit(0L)))
            .as("oov"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bigrams")).as("sum_bigrams"),
          sum(col("oov")).as("oov_mass")),
      batchId, path)

  /** The quality mix over all stored batches — the live q_ppl_bucket
    * output shape from the merged (lang, bucket) counts. `unscored`
    * rows are excluded here (live q_ppl_bucket can never emit them);
    * they surface through [[oovFromPartials]]. */
  def mixFromPartials(spark: SparkSession, path: String): DataFrame =
    PartialsStore.mergedSums(spark, path,
      Seq("lang", "bucket"), Seq("n_docs", "sum_bigrams"))
      .filter(col("bucket") =!= "unscored")
      .orderBy(col("lang"), col("bucket"))

  /** Calibration-vocabulary drift per lang: total bigrams the frozen
    * score join dropped and how many whole documents were unscorable.
    * Nonzero growth here means the stream's vocabulary is leaving the
    * calibration LM behind — re-arm the monitor. */
  def oovFromPartials(spark: SparkSession, path: String): DataFrame =
    PartialsStore.mergedSums(spark, path,
      Seq("lang", "bucket"), Seq("n_docs", "oov_mass"))
      .groupBy(col("lang"))
      .agg(sum(col("oov_mass")).as("oov_mass"),
        sum(when(col("bucket") === "unscored", col("n_docs"))
          .otherwise(lit(0L))).as("unscored_docs"))
      .orderBy(col("lang"))
}
