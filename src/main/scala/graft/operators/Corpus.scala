package graft.operators

import graft.{Fns, GQuery, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus preparation operators (SURVEY.md §2.11 extensions):
  * deterministic hash sampling and the composed dedup→filter→measure
  * pipeline a data-mixing job runs before training.
  *
  * Scale notes: hash sampling is a stateless per-row predicate — no
  * shuffle, no sampled-set materialization, reproducible across runs and
  * engines (md5, not `rand()`). The corpus-prep chain is one window
  * shuffle on the fingerprint (exact-dedup keeper selection) plus one
  * grouped aggregation; everything else is map-side projection. */
object Corpus {
  import Fns._

  val queries: Seq[(String, GQuery)] = Seq(

    // deterministic 1-in-10 hash sample: bucket = first 8 md5 hex digits of
    // the id, mod 10. Engine-identical (md5 of the same decimal string) and
    // stable run to run — the reproducible-sampling primitive for corpus
    // mixing; stratified variants filter per-source on the same bucket.
    "q_sample_hash" -> GQuery(
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "documents")
          .withColumn("bucket",
            pmod(conv(substring(md5($"doc_id".cast("string")), 1, 8),
              16, 10).cast("bigint"), lit(10)))
          .filter($"bucket" === 0)
          .select($"doc_id", $"source", $"lang", $"n_chars")
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, source, lang, n_chars FROM (
        |  SELECT *, ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 AS bucket
        |  FROM documents)
        |WHERE bucket = 0 ORDER BY doc_id""".stripMargin),
      "deterministic md5-bucket corpus sample"),

    // fixed-size token chunking with overlap (chunk 50, stride 40): the
    // context-window splitting primitive for training/RAG ingestion. Pure
    // per-row explode — no shuffle until the presentation sort; chunk
    // count is data-driven via the token count, identically on both
    // engines (integer division).
    "q_chunk_docs" -> GQuery(
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "documents")
          .withColumn("toks", tokens($"text"))
          .withColumn("n", size($"toks"))
          .filter($"n" > 0)
          .select($"doc_id", posexplode(expr(
            "transform(sequence(0, (n-1) div 40), " +
              "i -> concat_ws(' ', slice(toks, i*40+1, 50)))"))
            .as(Seq("chunk_id", "chunk")))
          .withColumn("chunk_tokens", size(split($"chunk", " ")))
          .orderBy($"doc_id", $"chunk_id")
      },
      Some("""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x != '') AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0)
        |SELECT doc_id,
        |  CAST(i AS INT) AS chunk_id,
        |  array_to_string(toks[i*40+1 : i*40+50], ' ') AS chunk,
        |  CAST(len(toks[i*40+1 : i*40+50]) AS INT) AS chunk_tokens
        |FROM n, unnest(generate_series(0, (n-1) // 40)) AS u(i)
        |ORDER BY doc_id, chunk_id""".stripMargin),
      "fixed-size overlapping token chunking"),

    // the composed training-data prep pass: exact dedup (normalized-text
    // fingerprint, min-doc_id keeper), minimum-length quality gate, token
    // counting, then the per-(source, lang) mix report a sampler consumes.
    // One window shuffle + one agg shuffle end to end.
    "q_corpus_prep" -> GQuery(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"fp").orderBy($"doc_id")
        Tables.load(s, d, "documents")
          .withColumn("fp", md5(regexp_replace(lower($"text"), "\\s+", " ")))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1) // dedup: keep lowest doc_id per fingerprint
          .withColumn("n_tokens", size(tokens($"text")))
          .filter($"n_tokens" >= 5) // quality gate: drop fragments
          .groupBy($"source", $"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_tokens").as("sum_tokens"),
            max($"n_tokens").as("max_tokens"))
          .orderBy($"source", $"lang")
      },
      Some("""WITH deduped AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY md5(regexp_replace(lower(text), '\s+', ' ', 'g'))
        |      ORDER BY doc_id) AS rn
        |    FROM documents) WHERE rn = 1),
        |measured AS (
        |  SELECT source, lang,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      t -> t != '')) AS n_tokens
        |  FROM deduped)
        |SELECT source, lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens, MAX(n_tokens) AS max_tokens
        |FROM measured WHERE n_tokens >= 5
        |GROUP BY source, lang ORDER BY source, lang""".stripMargin),
      "composed dedup -> quality gate -> token mix report"),

    // stratified hash sampling: a DIFFERENT deterministic fraction per
    // stratum (the data-mixing knob: up-sample scarce sources, down-sample
    // abundant ones). Same md5-bucket primitive as q_sample_hash — still a
    // stateless per-row predicate, no shuffle until the audit aggregation,
    // reproducible across engines and runs.
    "q_stratified_sample" -> GQuery(
      (s, d) => {
        import s.implicits._
        val bucket = pmod(conv(substring(md5($"doc_id".cast("string")), 1, 8),
          16, 10).cast("bigint"), lit(100))
        val keepPct = when($"source" === "src0", 10)
          .when($"source" === "src1", 50)
          .otherwise(25)
        Tables.load(s, d, "documents")
          .filter(bucket < keepPct)
          .groupBy($"source")
          .agg(count(lit(1)).as("n_sampled"))
          .orderBy($"source")
      },
      Some("""SELECT source, COUNT(*) AS n_sampled FROM (
        |  SELECT source,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
        |      AS bucket
        |  FROM documents)
        |WHERE bucket < CASE WHEN source = 'src0' THEN 10
        |  WHEN source = 'src1' THEN 50 ELSE 25 END
        |GROUP BY source ORDER BY source""".stripMargin),
      "stratified per-source hash sampling (data-mixing knob)"),
  )
}
