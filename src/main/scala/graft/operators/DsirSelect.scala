package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR-style data selection against a PERSISTED importance model — the
  * standing-store twin of `q_dsir` (Corpus.scala) and the funnel's final
  * production stage: ingest -> dedup -> gates -> near-dup -> decontaminate
  * -> SELECT. A 100 TB pipeline fits the importance model ONCE (target
  * domain vs raw pool, Xie et al. 2023's hashed-n-gram importance
  * resampling) and then scores every incoming batch against the frozen
  * table; re-deriving the model per batch would silently shift selection
  * as the pool grows.
  *
  * == Model state ==
  * The whole model is a `buckets`-row table `(bucket, lr6)` — the
  * Laplace-smoothed log importance ratio of hashed-bigram buckets in
  * MICRO-LOG-UNITS (`round(ln(r) * 1e6)` as BIGINT, the engine's
  * micro-unit recipe; see q_dsir's determinism note). That fixed width is
  * DSIR's core draw: model state is broadcast-sized forever, regardless
  * of corpus scale. Layout:
  * {{{
  * path/model/        (bucket, lr6)   — one tiny parquet
  * path/store_meta.txt                — buckets, checked on every score
  * }}}
  *
  * == Selection rule (deterministic, batch-invariant) ==
  * A doc is SELECTED iff its summed bucket weight clears a length-
  * normalized threshold: `sum(n_b * lr6_b) >= minAvgMicro * sum(n_b)` —
  * an ALL-INTEGER comparison (no double threshold wobble), equivalent to
  * "average per-bigram log ratio >= minAvgMicro micro-nats". The rule is
  * per-doc and stateless given the frozen model, so screening k batches
  * trivially equals the one-shot screen (pinned in DsirSelectSpec), and
  * a foreachBatch replay reaches identical verdicts. Docs with no
  * bigrams (under 2 tokens) carry no evidence either way and PASS — the
  * funnel's token gate owns short docs, the selector owns domain match.
  *
  * == 100 TB shapes ==
  * Per batch: one bigram explode, a (doc, bucket) partial agg bounded at
  * `buckets` rows per doc, a broadcast join with the model table, one
  * doc-keyed sum. Nothing is O(corpus); the model is never rescanned
  * from the pool. */
object DsirSelect {

  private def metaPath(path: String) = s"$path/store_meta.txt"

  /** Hashed-bigram bucket rows (idCol, bucket) — q_dsir's featurizer. */
  private def bigramBuckets(
      docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    docs.select(col(idCol), graft.Fns.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(__toks)-1), " +
          "i -> concat(element_at(__toks, i), ' ', " +
          "element_at(__toks, i+1)))")).as("__bg"))
      .select(col(idCol),
        pmod(conv(substring(md5(col("__bg")), 1, 8), 16, 10).cast("long"),
          lit(buckets.toLong)).as("bucket"))

  /** Fits and persists the importance model: per-bucket log ratio of the
    * TARGET domain's hashed-bigram distribution vs the raw POOL's,
    * Laplace-smoothed, in micro-log-units. One pass over each input;
    * the result is `buckets` rows. Overwrites any prior model at `path`
    * (refitting is an explicit operator decision, not an append). */
  def fitModel(
      target: DataFrame,
      pool: DataFrame,
      path: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = 64): Unit = {
    val spark = target.sparkSession
    StoreLayout.checkOrWriteMeta(spark, metaPath(path),
      Seq("buckets" -> buckets.toString))
    val tb = bigramBuckets(target, idCol, textCol, buckets)
    val pb = bigramBuckets(pool, idCol, textCol, buckets)
    val tc = tb.groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    val pc = pb.groupBy(col("bucket")).agg(count(lit(1)).as("cs"))
    val nt = tb.agg(count(lit(1)).cast("double").as("n_t"))
    val ns = pb.agg(count(lit(1)).cast("double").as("n_s"))
    spark.range(buckets).toDF("bucket")
      .join(tc, Seq("bucket"), "left")
      .join(pc, Seq("bucket"), "left")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(ns))
      .select(col("bucket"),
        round(log(
          (coalesce(col("ct"), lit(0L)).cast("double") + lit(1.0)) /
            (col("n_t") + lit(buckets.toDouble)) *
            ((col("n_s") + lit(buckets.toDouble)) /
              (coalesce(col("cs"), lit(0L)).cast("double") + lit(1.0)))) *
          lit(1e6), 0).cast("long").as("lr6"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("compression", "snappy").parquet(s"$path/model")
  }

  /** The persisted model table (bucket, lr6). */
  def model(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/model")

  /** LAZY per-doc selection of a batch against the frozen model: input
    * rows plus `dsir_w6` (summed micro-log-unit weight), `n_bigrams`,
    * and the `selected` verdict under the all-integer length-normalized
    * rule. Scoring with a bucket count differing from the model's is
    * refused (hashes would land in the wrong buckets silently). */
  def selectBatch(
      docs: DataFrame,
      path: String,
      minAvgMicro: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    StoreLayout.checkMeta(spark, metaPath(path),
      Seq("buckets" -> buckets.toString))
    val scores = bigramBuckets(docs, idCol, textCol, buckets)
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("n"))
      .join(broadcast(model(spark, path)), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("n") * col("lr6")).as("dsir_w6"),
        sum(col("n")).as("n_bigrams"))
    docs.join(scores, Seq(idCol), "left")
      .withColumn("dsir_w6", coalesce(col("dsir_w6"), lit(0L)))
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("selected",
        col("dsir_w6") >= lit(minAvgMicro) * col("n_bigrams"))
  }

  /** Continuous DSIR-selected ingest — the STREAMING arc of funnel
    * stage 6 (VERDICT r10 stretch #8): each micro-batch of `docs` (a
    * streaming DataFrame) is scored against the FROZEN model and its
    * SELECTED rows land exactly-once under `survivorsPath/batch_id=N`
    * (dynamic overwrite + checkpoint — the [[DecontamStore.ingestSink]]
    * recipe). Rejected docs are dropped, not landed. The model must be
    * fitted before the stream starts and stays frozen for its lifetime
    * — re-fitting mid-stream would silently shift selection as batches
    * arrive (rebuild offline instead; the [[IvfIndex]] frozen-centroid
    * contract). Selection is stateless given the model, so a replayed
    * micro-batch reaches identical verdicts and overwrites its own
    * partition; streaming-vs-batch parity is pinned in DsirSelectSpec. */
  def selectSink(
      docs: DataFrame,
      modelPath: String,
      survivorsPath: String,
      checkpointDir: String,
      minAvgMicro: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = 64,
      unbounded: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        selectBatch(batch, modelPath, minAvgMicro, idCol, textCol, buckets)
          .filter(col("selected"))
          .drop("selected", "dsir_w6", "n_bigrams")
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
