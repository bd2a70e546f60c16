package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end corpus-prep pipeline over the documents table plus injected
  * adversarial rows (a PII doc, an exact dup, a fragment, a degenerate
  * repeater) — each stage must remove exactly its target. */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("scrub→dedup→quality→chunk→sample→write, stage losses auditable") {
    val base = spark.read.parquet(s"$d/documents.parquet")
    val maxId = base.agg(max($"doc_id")).head().getLong(0)
    val firstText = base.orderBy($"doc_id").head().getAs[String]("text")
    val extra = Seq(
      // exact duplicate of doc 0 (whitespace-normalized): dedup removes
      (maxId + 1, "  " + firstText.toUpperCase + "  ", "en", "srcX", 1L),
      // PII carrier: scrub redacts, survives
      (maxId + 2, "reach me at a.b@mail.org or +12-555-0100 " +
        "plus enough tokens to pass the quality gate", "en", "srcX", 1L),
      // fragment: quality gate removes
      (maxId + 3, "too short", "en", "srcX", 1L),
      // degenerate repeater: repetition gate removes
      (maxId + 4, Seq.fill(60)("spam").mkString(" "), "en", "srcX", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val docs = base.unionByName(extra)

    val out = Files.createTempDirectory("graft_corpus_out").toString
    val report = CorpusPipeline.process(docs, out,
      keepPct = Map("srcX" -> 100), nearDupThreshold = 0.9)

    assert(report.docsIn == base.count() + 4)
    // the exact dup is gone (and near-dedup may fold more of the synthetic
    // corpus); the three other injected docs survive dedup
    assert(report.afterDedup <= report.docsIn - 1)
    // fragment + repeater die at the quality gate
    assert(report.afterQuality <= report.afterDedup - 2)
    assert(report.chunks >= report.afterQuality) // >=1 chunk per doc
    assert(report.sampledChunks <= report.chunks)

    val written = spark.read.parquet(report.outputPath)
    // partitioned layout by source + PII actually scrubbed
    assert(written.columns.contains("source"))
    val pii = written.filter($"doc_id" === maxId + 2)
      .select($"chunk").as[String].collect().mkString(" ")
    // chunk text is token-normalized (lowercased) downstream of the scrub
    assert(pii.contains("<email>") && pii.contains("<phone>"), pii)
    assert(!pii.contains("a.b@mail.org") && !pii.contains("+12-555-0100"))
    // partition pruning works on the mix layout
    val pruned = spark.read.parquet(report.outputPath)
      .filter($"source" === "srcX")
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters"))
    // mix report exists with the expected columns
    val mix = spark.read.option("header", "true")
      .csv(s"$out/mix_report.csv")
    assert(mix.columns.toSeq ==
      Seq("source", "lang", "n_chunks", "sum_tokens"))
    assert(mix.count() > 0)
  }
}
