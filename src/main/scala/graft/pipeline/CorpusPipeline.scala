package graft.pipeline

import graft.Fns
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed training-corpus preparation pipeline — the documents-table
  * analogue of [[graft.xml.XmlPipeline]]: PII scrub → exact + near dedup →
  * quality gate → context-window chunking → stratified mix sampling →
  * partitioned parquet + mix-report sinks. Each stage is also available
  * standalone (operators.{Text,Dedup,Corpus}); this object wires them in
  * the order a production ingest runs them, with one report row per stage
  * so data loss is auditable.
  *
  * Scale notes: every stage is a declarative transform on the same
  * DataFrame lineage — no driver-side materialization between stages; the
  * only shuffles are the dedup keeper window, the LSH band exchange, and
  * the final partitioned write. Chunks write partitioned by `source` so
  * downstream mixing jobs prune at the directory level.
  */
object CorpusPipeline {

  final case class CorpusReport(
      docsIn: Long,
      afterDedup: Long,
      afterQuality: Long,
      chunks: Long,
      sampledChunks: Long,
      outputPath: String)

  private val EmailRe = "[A-Za-z0-9._]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+[0-9]{2}-[0-9]{3}-[0-9]{4}"

  /** PII redaction (same patterns as q_pii_scrub). */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn(textCol,
      regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"))

  /** Minimum-token + repetition-ratio quality gate (q_repetition's
    * signal): drops fragments and degenerate repeated-token documents. */
  def qualityGate(
      docs: DataFrame,
      textCol: String = "text",
      minTokens: Int = 5,
      maxRepetition: Double = 0.98): DataFrame = {
    val toks = Fns.tokens(col(textCol))
    docs
      .withColumn("__n", size(toks))
      .withColumn("__rep",
        lit(1.0) - size(array_distinct(toks)).cast("double") /
          greatest(col("__n"), lit(1)))
      .filter(col("__n") >= minTokens && col("__rep") <= maxRepetition)
      .drop("__n", "__rep")
  }

  /** Fixed-size overlapping chunking (q_chunk_docs shape). */
  def chunk(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      chunkTokens: Int = 50,
      stride: Int = 40): DataFrame =
    docs
      .withColumn("__toks", Fns.tokens(col(textCol)))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col("*"), posexplode(expr(
        s"transform(sequence(0, (__n-1) div $stride), " +
          s"i -> concat_ws(' ', slice(__toks, i*$stride+1, $chunkTokens)))"))
        .as(Seq("chunk_id", "chunk")))
      .drop("__toks", "__n", textCol)

  /** Deterministic stratified mix sampling (q_stratified_sample shape):
    * per-stratum keep percentage on an md5 bucket of (id, chunk_id). */
  def mixSample(
      chunks: DataFrame,
      strataCol: String = "source",
      keepPct: Map[String, Int] = Map.empty,
      defaultPct: Int = 100,
      idCol: String = "doc_id"): DataFrame = {
    val bucket = pmod(conv(substring(
      md5(concat_ws("|", col(idCol), col("chunk_id"))), 1, 8), 16, 10)
      .cast("bigint"), lit(100))
    val pct = keepPct.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, v).otherwise(acc)
    }
    chunks.filter(bucket < pct)
  }

  /** Full pass. `nearDupThreshold` <= 0 skips the LSH stage (exact dedup
    * always runs). Writes chunks partitioned by `source` plus a
    * per-(source, lang) mix report CSV. */
  def process(
      docs: DataFrame,
      outputDir: String,
      minTokens: Int = 5,
      nearDupThreshold: Double = 0.7,
      chunkTokens: Int = 50,
      stride: Int = 40,
      keepPct: Map[String, Int] = Map.empty): CorpusReport = {
    val docsIn = docs.count()

    val cleaned = scrub(docs)
    val deduped =
      (if (nearDupThreshold > 0)
        Dedup.deduplicate(cleaned, "doc_id", "text", nearDupThreshold)
      else {
        val w = Window.partitionBy(col("__fp")).orderBy(col("doc_id"))
        cleaned
          .withColumn("__fp",
            md5(regexp_replace(lower(col("text")), "\\s+", " ")))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn", "__fp")
      }).cache()
    val afterDedup = deduped.count()

    val gated = qualityGate(deduped, minTokens = minTokens)
    val chunks = chunk(gated,
      chunkTokens = chunkTokens, stride = stride).cache()
    val nChunks = chunks.count()
    val afterQuality = chunks.select("doc_id").distinct().count()

    val sampled = mixSample(chunks, keepPct = keepPct).cache()
    val nSampled = sampled.count()

    val outPath = s"$outputDir/chunks.parquet"
    sampled.write.mode(SaveMode.Overwrite)
      .partitionBy("source")
      .option("compression", "snappy").parquet(outPath)

    sampled
      .withColumn("n_tokens", size(split(col("chunk"), " ")))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("sum_tokens"))
      .orderBy(col("source"), col("lang"))
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(s"$outputDir/mix_report.csv")

    deduped.unpersist(); chunks.unpersist(); sampled.unpersist()
    CorpusReport(docsIn, afterDedup, afterQuality, nChunks, nSampled, outPath)
  }
}
