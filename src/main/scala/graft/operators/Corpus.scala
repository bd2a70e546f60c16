package graft.operators

import graft.{Fns, GQuery, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Checkpoint.CutOps

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

  /** The q_prep_funnel stage chain, parameterized by a per-stage
    * `persist` hook so the SAME stage recipes serve both consumers:
    * the verified query passes identity (ONE lazy plan, side-effect-free
    * per bench rep), and [[prepFunnelMaterialized]] passes write+re-read
    * (the production knob the query's doc comment promises — each
    * survivor table is a product, and downstream stages resume from the
    * parquet on disk, which is what makes a 100 TB funnel
    * checkpoint-safe). CorpusFunnelSpec pins row-for-row parity of the
    * two modes' yield tables. */
  private[operators] def prepFunnel(
      s: SparkSession,
      d: String,
      persist: (String, org.apache.spark.sql.DataFrame) =>
        org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, d, "documents")
      .withColumn("toks", tokens($"text"))
      .withColumn("n_tokens", size($"toks").cast("long"))
    val w = Window.partitionBy($"fp").orderBy($"doc_id")
    val s1 = persist("s1_exact_dedup", docs
      .withColumn("fp", md5(regexp_replace(lower($"text"), "\\s+", " ")))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("fp", "rn"))
    val s2 = persist("s2_quality_min20", s1.filter($"n_tokens" >= 20))
    val s3 = persist("s3_lang", s2.filter($"lang".isin("en", "zh", "de")))
    // near-dup over SURVIVORS only (the production order: cheap
    // exact/gate stages shrink the expensive pair stage's input)
    val sh = s3.select($"doc_id", explode(expr(
        "transform(sequence(1, size(toks)-2), i -> concat_ws(' ', slice(toks, i, 3)))"))
        .as("sg"))
      .withColumn("h",
        conv(substring(md5($"sg"), 1, 8), 16, 10).cast("long"))
      .select($"doc_id", $"h").distinct()
      // r15 checkpointed the shingle table here (3 consumers); r16
      // re-adjudicated at local[32]: LAZY wins (isolated min-of-5 3.05
      // vs 3.61 s) — the consumers rebuild the explode from the s1/s3
      // checkpoint in parallel inside one job, while the checkpoint
      // paid a barrier + a corpus-scale copy. sig (below) keeps its
      // cut: dropping it re-runs the explode+agg four times (3.26 s)
    val mins = Dedup.mhPerms.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * $"h" + lit(b), lit(Dedup.MhPrime)))
        .as(s"m${i + 1}")
    }
    // ONE doc-keyed aggregation carries the 8 signature mins AND the
    // shingle count: nsh used to be its own groupBy over a second
    // build of the shingle table — fusing it drops a full
    // scan+explode+distinct+shuffle from the plan (same values: both
    // aggregate the same distinct (doc_id, h) rows)
    val sig = sh.groupBy($"doc_id")
      .agg(mins.head, (mins.tail :+ count(lit(1)).as("nsh")): _*)
      // r15: doc-keyed, consumed by both band views and both nsh
      // join-backs — one materialization instead of four rebuilds
      // (r16 A/B: dropping it is 3.26 vs 3.05 s — kept)
      .cut
    val bands = sig.select($"doc_id", lit(1).as("band_no"),
        md5(concat_ws("|", $"m1", $"m2", $"m3", $"m4")).as("bk"))
      .union(sig.select($"doc_id", lit(2).as("band_no"),
        md5(concat_ws("|", $"m5", $"m6", $"m7", $"m8")).as("bk")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_no") === col("y.band_no") &&
          col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    val cnt = sig.select($"doc_id", $"nsh")
    val dropNear = cand
      .join(sh.select($"doc_id".as("d1"), $"h"), "d1")
      .join(sh.select($"doc_id".as("d2"), $"h"), Seq("d2", "h"))
      .groupBy($"d1", $"d2").agg(count(lit(1)).as("inter"))
      .join(cnt.select($"doc_id".as("d1"), $"nsh".as("n1")), "d1")
      .join(cnt.select($"doc_id".as("d2"), $"nsh".as("n2")), "d2")
      .filter($"inter".cast("double") /
        ($"n1" + $"n2" - $"inter") >= 0.7)
      .select($"d2".as("doc_id")).distinct()
    val s4 = persist("s4_near_dedup",
      s3.join(dropNear, Seq("doc_id"), "left_anti"))
    val s4b = s4.withColumn("bucket",
      pmod(conv(substring(md5($"doc_id".cast("string")), 1, 8),
        16, 10), lit(100)))
    // decontamination screens on LONG (8-gram) shingles — its own
    // table, not the near-dup 3-grams: short grams are common
    // phrases (on this corpus they'd wipe the training split —
    // measured: 3-gram screen left 2 docs, 8-gram flags exactly the
    // 4 planted cross-split leaks), long grams are verbatim leakage
    val sh8 = s4b.filter(size($"toks") >= 8)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(toks)-7), i -> concat_ws(' ', slice(toks, i, 8)))"))
        .as("sg"))
      .select($"doc_id", md5($"sg").as("h8")).distinct()
      // r15: two consumers (heldout gram set + contamination probe;
      // r16 A/B: dropping this cut measured 3.68 vs 3.05 s — kept)
      .cut
    val heldSh = s4b.filter($"bucket" >= 80)
      .select($"doc_id").join(sh8, "doc_id")
      .select($"h8").distinct()
    val contaminated = sh8.join(heldSh, "h8")
      .select($"doc_id").distinct()
    val s5 = persist("s5_train_decontaminated", s4b.filter($"bucket" < 80)
      .join(contaminated, Seq("doc_id"), "left_anti"))
    def st(no: Int, name: String,
        df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum($"n_tokens"), lit(0L)).as("sum_tokens"))
        .select(lit(no).as("stage_no"), lit(name).as("stage"),
          $"n_docs", $"sum_tokens")
    st(0, "raw", docs)
      .unionByName(st(1, "exact_dedup", s1))
      .unionByName(st(2, "quality_min20", s2))
      .unionByName(st(3, "lang_en_zh_de", s3))
      .unionByName(st(4, "near_dedup_j07", s4))
      .unionByName(st(5, "train_decontaminated", s5))
      .orderBy($"stage_no")
  }

  /** The funnel with every stage's survivor table WRITTEN to
    * `$outDir/<stage>` and re-read before the next stage consumes it —
    * the checkpoint-safe production mode (a failed 100 TB run resumes
    * from the last landed stage; each product is independently
    * queryable). Returns the same 6-row yield table as `q_prep_funnel`,
    * row for row (CorpusFunnelSpec). */
  def prepFunnelMaterialized(
      s: SparkSession, d: String, outDir: String)
      : org.apache.spark.sql.DataFrame =
    prepFunnel(s, d, (name, df) => {
      val p = s"$outDir/$name"
      df.write.mode("overwrite")
        .option("compression", "snappy").parquet(p)
      s.read.parquet(p)
    })

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

    // weighted sampling WITHOUT replacement (Efraimidis–Spirakis): key =
    // -ln(u)/w with u a deterministic md5-derived uniform in (0,1], take
    // the k smallest keys per stratum — the exact distributed analogue of
    // a weighted reservoir, as one window over a stateless projection.
    // Deterministic across engines AND runs (no rand()); weights here are
    // document length, the usual proxy when mixing by token budget.
    "q_weighted_sample" -> GQuery(
      (s, d) => {
        import s.implicits._
        val h = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
          .cast("bigint")
        val u = (h + lit(1)).cast("double") / lit(4294967297.0)
        val w = Window.partitionBy($"source")
          .orderBy($"key", $"doc_id")
        Tables.load(s, d, "documents")
          .filter($"n_chars" > 0)
          .withColumn("key", -log(u) / $"n_chars")
          .withColumn("rk", row_number().over(w))
          .filter($"rk" <= 5)
          .select($"source", $"rk", $"doc_id", $"n_chars")
          .orderBy($"source", $"rk")
      },
      Some("""SELECT source, rk, doc_id, n_chars FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      -ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
        |          / 4294967297.0) / n_chars,
        |      doc_id) AS rk
        |  FROM documents WHERE n_chars > 0)
        |WHERE rk <= 5 ORDER BY source, rk""".stripMargin),
      "Efraimidis-Spirakis weighted sampling without replacement"),

    // temperature-scaled source mixing (the multinomial-sampling weights
    // of multilingual/multi-source training, alpha = 0.7): w_i ∝ c_i^α
    // over per-source token counts. Token counts are exact integer sums;
    // the power/normalize math is the identical double formula on both
    // engines. Two tiny aggregations — the second is a broadcast scalar.
    // The normalizer z = SUM(scaled) is a ~10-double sum whose ADDITION
    // ORDER varies with parallel group arrival in BOTH engines (1-ulp
    // run-to-run flap at significant digit 15, caught by the %.15g local
    // gate in round 10), so the weights are emitted as integer
    // micro-units — round-to-integer absorbs the 1e-16-relative noise.
    "q_mix_temperature" -> GQuery(
      (s, d) => {
        import s.implicits._
        val counts = Tables.load(s, d, "documents")
          .withColumn("n_tokens", size(tokens($"text")).cast("bigint"))
          .groupBy($"source")
          .agg(sum($"n_tokens").as("n_tokens"))
        val scaled = counts
          .withColumn("scaled", pow($"n_tokens".cast("double"), lit(0.7)))
        val total = scaled.agg(sum($"scaled").as("z"))
        scaled.crossJoin(total)
          .select($"source", $"n_tokens",
            expr("CAST(round(scaled / z * 1000000.0, 0) AS BIGINT)")
              .as("weight_micro"),
            expr("CAST(round(scaled / z * 100000.0 * 1000000.0, 0) " +
              "AS BIGINT)").as("draws_micro"))
          .orderBy($"source")
      },
      Some(s"""WITH c AS (
        |  SELECT source,
        |    CAST(SUM(len(${sqlTokens("text")})) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |s AS (SELECT source, n_tokens,
        |    power(CAST(n_tokens AS DOUBLE), 0.7) AS scaled FROM c)
        |SELECT source, n_tokens,
        |  CAST(round(scaled / (SELECT SUM(scaled) FROM s) * 1000000.0, 0)
        |    AS BIGINT) AS weight_micro,
        |  CAST(round(scaled / (SELECT SUM(scaled) FROM s) * 100000.0
        |    * 1000000.0, 0) AS BIGINT) AS draws_micro
        |FROM s ORDER BY source""".stripMargin),
      "temperature-scaled (alpha=0.7) source mixing weights"),

    // Leave-one-out source attribution: for each source, how much does
    // REMOVING it move the corpus-mean document length — the cheapest
    // member of the data-valuation family (the closed-form special case
    // of leave-one-out influence over the group partition; a quality
    // score would slot in for n_chars unchanged). Everything derives
    // from per-source (count, sum) pairs, so the whole readout is one
    // grouped partial agg + one 1-row total anchor: loo_mean_s =
    // (S - sum_s) / (N - n_s), delta = corpus mean - loo mean (positive
    // delta = the source pulls the mean UP, dropping it lowers it).
    // The single-source corpus edge (N = n_s) emits NULL via an
    // explicit guard — the q_ipw degenerate-input contract. Scale: one
    // source-keyed partial-agg shuffle; the source table (~dozens of
    // rows) is checkpointed for its two consumers.
    "q_loo_source" -> GQuery(
      (s, d) => {
        import s.implicits._
        val src = Tables.load(s, d, "documents")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sc"))
          .localCheckpoint()
        val tot = src.agg(sum($"n_docs").as("nn"), sum($"sc").as("ss"))
        src.crossJoin(broadcast(tot))
          .select($"source", $"n_docs",
            expr("CAST(round(CAST(sc AS DOUBLE) / " +
              "CAST(n_docs AS DOUBLE) * 1000000.0, 0) AS BIGINT)")
              .as("mean_chars_micro"),
            expr("CASE WHEN nn = n_docs THEN CAST(NULL AS BIGINT) " +
              "ELSE CAST(round((CAST(ss AS DOUBLE) / " +
              "CAST(nn AS DOUBLE) - CAST(ss - sc AS DOUBLE) / " +
              "CAST(nn - n_docs AS DOUBLE)) * 1000000.0, 0) AS BIGINT)" +
              " END").as("loo_delta_micro"))
          .orderBy($"source")
      },
      Some("""WITH src AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS sc
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn,
        |               CAST(SUM(sc) AS BIGINT) AS ss FROM src)
        |SELECT source, n_docs,
        |  CAST(round(CAST(sc AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |    * 1000000.0, 0) AS BIGINT) AS mean_chars_micro,
        |  CASE WHEN nn = n_docs THEN CAST(NULL AS BIGINT)
        |    ELSE CAST(round((CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE) -
        |      CAST(ss - sc AS DOUBLE) / CAST(nn - n_docs AS DOUBLE))
        |      * 1000000.0, 0) AS BIGINT) END AS loo_delta_micro
        |FROM src, tot ORDER BY source""".stripMargin),
      "leave-one-out source attribution on mean document length " +
        "(closed-form group influence from per-source sums)"),

    // Epoch token-budget allocation — the step AFTER q_mix_temperature's
    // weights: given a total token budget (50k here), each source gets
    // floor(budget * weight) tokens, then docs fill the allocation in
    // deterministic md5-hash order via a per-source running sum (greedy
    // knapsack is inherently sequential; hash-order cumulative fill is
    // the order-stable distributed version — one window per source).
    // Weights use 9-dp-rounded scaled counts summed as DECIMAL so the
    // normalizer is order-independent (unlike a raw double sum).
    "q_token_budget" -> GQuery(
      (s, d) => {
        import s.implicits._
        val docs = Tables.load(s, d, "documents")
          .withColumn("n_tokens", size(tokens($"text")).cast("bigint"))
          .withColumn("h", md5($"doc_id".cast("string")))
        val counts = docs.groupBy($"source")
          .agg(sum($"n_tokens").as("src_tokens"))
          .withColumn("scaled",
            round(pow($"src_tokens".cast("double"), lit(0.7)), 9)
              .cast("decimal(28,9)"))
        val z = counts.agg(sum($"scaled").as("z"))
        val budgets = counts.crossJoin(broadcast(z))
          .select($"source",
            floor($"scaled".cast("double") / $"z".cast("double") *
              lit(50000.0)).cast("bigint").as("budget_toks"))
        val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs.withColumn("cum", sum($"n_tokens").over(w))
          .join(broadcast(budgets), "source")
          .filter($"cum" <= $"budget_toks")
          .groupBy($"source", $"budget_toks")
          .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_toks"))
          .select($"source", $"budget_toks", $"n_docs", $"n_toks")
          .orderBy($"source")
      },
      Some(s"""WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |c AS (SELECT source, SUM(n_tokens) AS src_tokens FROM d
        |      GROUP BY source),
        |sc AS (SELECT source,
        |    CAST(round(power(CAST(src_tokens AS DOUBLE), 0.7), 9)
        |      AS DECIMAL(28,9)) AS scaled FROM c),
        |z AS (SELECT SUM(scaled) AS z FROM sc),
        |b AS (SELECT source,
        |    CAST(floor(CAST(scaled AS DOUBLE) / CAST(z.z AS DOUBLE)
        |      * 50000.0) AS BIGINT) AS budget_toks FROM sc, z),
        |cum AS (
        |  SELECT source, doc_id, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d)
        |SELECT cum.source, b.budget_toks,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_toks
        |FROM cum JOIN b USING (source) WHERE cum <= budget_toks
        |GROUP BY 1, 2 ORDER BY source""".stripMargin),
      "epoch token-budget allocation: hash-order cumulative fill per source"),

    // Corpus balance diagnostic: Gini coefficient of the per-source token
    // distribution — the single number data-mixing dashboards track for
    // "is one source dominating the corpus". Computed by the sorted
    // cumulative formula G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))
    // over rank-ordered source sizes: every term is exact integer
    // arithmetic until the one final division, so both engines emit the
    // identical double. Source counts are a ~20-row table; the rank
    // window is trivially single-partition HERE and stays safe at scale
    // because its input is one row per SOURCE, not per document.
    "q_gini" -> GQuery(
      (s, d) => {
        import s.implicits._
        val counts = Tables.load(s, d, "documents")
          .withColumn("n_tokens", size(tokens($"text")).cast("bigint"))
          .groupBy($"source").agg(sum($"n_tokens").as("x"))
        val w = Window.orderBy($"x", $"source")
        counts.withColumn("i", row_number().over(w).cast("bigint"))
          .agg(count(lit(1)).as("n_sources"),
            sum($"x").as("total_tokens"),
            sum($"i" * $"x").as("ixsum"))
          .select($"n_sources", $"total_tokens",
            round((lit(2L) * $"ixsum" - ($"n_sources" + 1L) * $"total_tokens")
              .cast("double") /
              ($"n_sources" * $"total_tokens").cast("double"), 6).as("gini"))
      },
      Some(s"""WITH c AS (
        |  SELECT source,
        |    CAST(SUM(len(${sqlTokens("text")})) AS BIGINT) AS x
        |  FROM documents GROUP BY source),
        |r AS (SELECT x,
        |    CAST(row_number() OVER (ORDER BY x, source) AS BIGINT) AS i
        |  FROM c)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
        |  CAST(SUM(x) AS BIGINT) AS total_tokens,
        |  round(CAST(2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x) AS DOUBLE)
        |    / CAST(COUNT(*) * SUM(x) AS DOUBLE), 6) AS gini
        |FROM r""".stripMargin),
      "Gini coefficient of per-source token distribution (corpus balance)"),

    // sequence packing (concat-and-chunk): docs concatenated per source in
    // doc_id order, cut into 512-token context windows; a doc belongs to
    // the bin its start offset lands in. One running-sum window per
    // source + one aggregation — the deterministic distributed version of
    // the pretraining packer (greedy first-fit is inherently sequential;
    // offset packing is order-stable and shuffle-minimal at any scale).
    "q_pack_sequences" -> GQuery(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"source").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.load(s, d, "documents")
          .withColumn("n_tokens", size(tokens($"text")).cast("bigint"))
          .filter($"n_tokens" > 0)
          .withColumn("cum", sum($"n_tokens").over(w))
          .withColumn("bin", (($"cum" - $"n_tokens") / lit(512))
            .cast("bigint"))
          .groupBy($"source", $"bin")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_tokens").as("bin_tokens"),
            min($"doc_id").as("first_doc"))
          .withColumn("fill", $"bin_tokens".cast("double") / lit(512.0))
          .orderBy($"source", $"bin")
      },
      Some(s"""WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t WHERE n_tokens > 0)
        |SELECT source, CAST((cum - n_tokens) // 512 AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
        |  MIN(doc_id) AS first_doc,
        |  CAST(SUM(n_tokens) AS DOUBLE) / 512.0 AS fill
        |FROM c GROUP BY source, bin ORDER BY source, bin""".stripMargin),
      "sequence packing into 512-token context windows"),

    // lexical-diversity quality signals: type-token ratio + hapax ratio
    // per document. One explode + per-(doc, token) count + one re-agg —
    // linear, partial-agg friendly, no quadratic per-doc lambda.
    "q_ttr" -> GQuery(
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "documents")
          .select($"doc_id", explode(tokens($"text")).as("tok"))
          .groupBy($"doc_id", $"tok")
          .agg(count(lit(1)).as("tf"))
          .groupBy($"doc_id")
          .agg(sum($"tf").as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum(when($"tf" === 1, 1L).otherwise(0L)).as("n_hapax"))
          .select($"doc_id", $"n_tokens".cast("bigint").as("n_tokens"),
            $"n_types", $"n_hapax",
            ($"n_types".cast("double") / $"n_tokens".cast("double"))
              .as("ttr"),
            ($"n_hapax".cast("double") / $"n_types".cast("double"))
              .as("hapax_ratio"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH e AS (
        |  SELECT doc_id, unnest(${sqlTokens("text")}) AS tok FROM documents),
        |tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf FROM e GROUP BY doc_id, tok),
        |a AS (
        |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |    COUNT(*) AS n_types,
        |    CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
        |  FROM tf GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_types, n_hapax,
        |  CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
        |  CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE) AS hapax_ratio
        |FROM a ORDER BY doc_id""".stripMargin),
      "type-token + hapax lexical-diversity quality signals"),

    // markup/boilerplate stripping (same injected-then-cleaned pattern as
    // q_pii_scrub: the testdata is clean, so wrap each text in
    // deterministic markup, then strip tags + collapse entities +
    // whitespace — asserting the cleaner recovers the original). Pure
    // per-row regex projection: no shuffle, codegen'd.
    "q_html_strip" -> GQuery(
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "documents")
          .withColumn("html", concat(
            lit("<html><body><p class=\"x\">"), $"text",
            lit("&nbsp;</p><br/><div>footer&amp;legal</div></body></html>")))
          .withColumn("stripped", trim(regexp_replace(regexp_replace(
            regexp_replace($"html", "<[^>]*>", " "),
            "&(nbsp|amp|lt|gt|quot);", " "), "\\s+", " ")))
          .select($"doc_id", length($"html").as("html_len"),
            length($"stripped").as("clean_len"),
            ($"stripped" === concat(trim(regexp_replace($"text", "\\s+", " ")),
              lit(" footer legal"))).as("clean_roundtrip"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, length(html) AS html_len,
        |  length(stripped) AS clean_len,
        |  stripped = trim(regexp_replace(text, '\s+', ' ', 'g')) || ' footer legal'
        |    AS clean_roundtrip
        |FROM (
        |  SELECT doc_id, text,
        |    '<html><body><p class="x">' || text ||
        |      '&nbsp;</p><br/><div>footer&amp;legal</div></body></html>' AS html,
        |    trim(regexp_replace(regexp_replace(regexp_replace(
        |      '<html><body><p class="x">' || text ||
        |        '&nbsp;</p><br/><div>footer&amp;legal</div></body></html>',
        |      '<[^>]*>', ' ', 'g'),
        |      '&(nbsp|amp|lt|gt|quot);', ' ', 'g'), '\s+', ' ', 'g')) AS stripped
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin),
      "HTML/markup stripping with entity + whitespace normalization"),

    // deterministic train/val/test split (80/10/10 by md5 bucket) with the
    // per-source audit a dataset card reports. Same stateless hash-bucket
    // primitive as q_sample_hash — any row's split is recomputable from
    // its id alone (no stored assignment table, no shuffle to assign).
    "q_split" -> GQuery(
      (s, d) => {
        import s.implicits._
        val bucket = pmod(conv(substring(md5($"doc_id".cast("string")), 1, 8),
          16, 10).cast("bigint"), lit(100))
        Tables.load(s, d, "documents")
          .withColumn("split", when(bucket < 80, "train")
            .when(bucket < 90, "val").otherwise("test"))
          .groupBy($"source")
          .agg(
            sum(when($"split" === "train", 1L).otherwise(0L)).as("n_train"),
            sum(when($"split" === "val", 1L).otherwise(0L)).as("n_val"),
            sum(when($"split" === "test", 1L).otherwise(0L)).as("n_test"))
          .orderBy($"source")
      },
      Some("""SELECT source,
        |  CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |  CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
        |  CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
        |FROM (
        |  SELECT source, CASE
        |    WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80 THEN 'train'
        |    WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM documents)
        |GROUP BY source ORDER BY source""".stripMargin),
      "deterministic 80/10/10 train/val/test split audit"),

    // the packed sequences THEMSELVES (q_pack_sequences reports the bin
    // stats; this emits the training payload): per (source, bin), member
    // docs concatenated in doc_id order with an <eos> separator. The
    // ordered concat is array_sort(collect_list(struct)) — deterministic
    // without an extra sort shuffle; output rows are bounded by bin size.
    "q_pack_emit" -> GQuery(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"source").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.load(s, d, "documents")
          .withColumn("n_tokens", size(tokens($"text")).cast("bigint"))
          .filter($"n_tokens" > 0)
          .withColumn("bin",
            ((sum($"n_tokens").over(w) - $"n_tokens") / lit(512))
              .cast("bigint"))
          .groupBy($"source", $"bin")
          .agg(concat_ws(" <eos> ", expr(
            "transform(array_sort(collect_list(struct(doc_id, text))), s -> s.text)"))
            .as("packed"))
          .select($"source", $"bin", length($"packed").as("packed_chars"),
            $"packed")
          .orderBy($"source", $"bin")
      },
      Some(s"""WITH t AS (
        |  SELECT source, doc_id, text,
        |    CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, text,
        |    CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens) // 512 AS BIGINT) AS bin
        |  FROM t WHERE n_tokens > 0)
        |SELECT source, bin, length(packed) AS packed_chars, packed FROM (
        |  SELECT source, bin,
        |    string_agg(text, ' <eos> ' ORDER BY doc_id) AS packed
        |  FROM c GROUP BY source, bin)
        |ORDER BY source, bin""".stripMargin),
      "packed training sequences with <eos> separators"),

    // one BPE-training statistics pass: frequency of adjacent character
    // pairs inside whitespace tokens (the quantity a byte-pair-encoding
    // merge step maximizes). explode to (token) then to (pair) —
    // two generators + one partial-agg count, linear in corpus bytes.
    "q_bpe_pairs" -> GQuery(
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "documents")
          .select(explode(tokens($"text")).as("tok"))
          .filter(length($"tok") >= 2)
          .select(explode(expr(
            "transform(sequence(1, length(tok)-1), i -> substring(tok, i, 2))"))
            .as("pair"))
          .groupBy($"pair")
          .agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"pair")
          .limit(20)
      },
      Some(s"""WITH toks AS (
        |  SELECT unnest(${sqlTokens("text")}) AS tok FROM documents),
        |pairs AS (
        |  SELECT substring(tok, CAST(i AS INT), 2) AS pair
        |  FROM toks, unnest(generate_series(1, length(tok)-1)) AS u(i)
        |  WHERE length(tok) >= 2)
        |SELECT pair, COUNT(*) AS n FROM pairs
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin),
      "BPE merge-step statistics: adjacent character-pair frequencies"),

    // Corpus composition report: per-source document/token counts, global
    // shares, and the cumulative token share walking sources from largest
    // to smallest — the table a data-mixture decision starts from ("the
    // top k sources cover X% of tokens"). One doc-keyed token count, one
    // source rollup (source cardinality is tiny — the rollup output is a
    // broadcast-sized table, so the ordered cumulative window runs over a
    // bounded domain, not data-scale rows). Shares divide exact BIGINTs
    // in double space.
    "q_domain_mix" -> GQuery(
      (s, d) => {
        import s.implicits._
        val bySrc = Tables.load(s, d, "documents")
          .withColumn("n_toks", size(tokens($"text")).cast("long"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("n_tokens"))
        val tot = bySrc.agg(
          sum($"n_docs").cast("double").as("td"),
          sum($"n_tokens").cast("double").as("tt"))
        val w = Window.orderBy($"n_tokens".desc, $"source")
          .rowsBetween(Window.unboundedPreceding, 0)
        bySrc.crossJoin(broadcast(tot))
          .select($"source", $"n_docs", $"n_tokens",
            round($"n_docs".cast("double") / $"td", 6).as("doc_share"),
            round($"n_tokens".cast("double") / $"tt", 6).as("token_share"),
            round(sum($"n_tokens").over(w).cast("double") / $"tt", 6)
              .as("cum_token_share"))
          .orderBy($"n_tokens".desc, $"source")
      },
      Some(s"""WITH s AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len(${sqlTokens("text")})) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |t AS (
        |  SELECT CAST(SUM(n_docs) AS DOUBLE) AS td,
        |    CAST(SUM(n_tokens) AS DOUBLE) AS tt FROM s)
        |SELECT source, n_docs, n_tokens,
        |  round(CAST(n_docs AS DOUBLE) / t.td, 6) AS doc_share,
        |  round(CAST(n_tokens AS DOUBLE) / t.tt, 6) AS token_share,
        |  round(CAST(SUM(n_tokens) OVER (ORDER BY n_tokens DESC, source
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / t.tt, 6)
        |    AS cum_token_share
        |FROM s, t ORDER BY n_tokens DESC, source""".stripMargin),
      "per-source corpus mixture report with cumulative token coverage"),

    // The CAPSTONE composition: the full pretraining-prep funnel as ONE
    // lazy plan — exact dedup → length gate → language filter → MinHash
    // near-dup drop → train/heldout split → n-gram decontamination —
    // with a per-stage (n_docs, sum_tokens) yield row, the table a data
    // lead reads before committing a 100 TB prep run. Every stage is a
    // recipe already oracle-proven in isolation (q_corpus_prep's keeper
    // window, q_lsh_bucket_join's md5-minhash bands + exact verify,
    // q_sample_hash's md5 split, q_contamination's shingle screen), so
    // the DuckDB side replays the ENTIRE funnel and the hash proves the
    // composition, not just the parts. Scale shape: one fingerprint
    // window + one signature partial-agg + band-keyed candidate join
    // (verify touches candidates only) + two anti-joins — no stage
    // rescans a previous stage's input, and stage stats ride the same
    // lazy plan (six 1-row aggs, no collects). A real 100 TB prep run
    // would MATERIALIZE each stage's survivor table (they are the
    // pipeline's products, not intermediates). Since r15 the registered
    // query EAGERLY cuts the expensive stage survivors and the
    // signature/8-gram tables during construction (side-effecting, and
    // timed by Bench since construction happens inside the timed fn);
    // the parquet-writing production twin is prepFunnelMaterialized.
    "q_prep_funnel" -> GQuery(
      // r15: the EXPENSIVE stage survivors (the exact-dedup window, the
      // near-dup anti-join) materialize via localCheckpoint (executor
      // blocks — no parquet round-trip); the pure-filter stages s2/s3/s5
      // stay lazy (checkpointing a filter is a data-copy job for work
      // that recomputes in microseconds off the s1/s4 checkpoints). The
      // identity one-plan form re-derived each stage's ancestry per
      // consumer — 98 parquet scans in the before-plan; the
      // parquet-materialized production twin stays
      // prepFunnelMaterialized, parity-pinned by CorpusFunnelSpec.
      (s, d) => prepFunnel(s, d, (name, df) =>
        if (name == "s1_exact_dedup" || name == "s4_near_dedup")
          Checkpoint.cut(df)
        else df),
      Some {
        val minExprs = Dedup.mhPerms.zipWithIndex.map { case ((a, b), i) =>
          s"    MIN(($a * h + $b) % ${Dedup.MhPrime}) AS m${i + 1}"
        }.mkString(",\n|")
        s"""WITH meas AS (
        |  SELECT doc_id, lang, text, ${sqlTokens("text")} AS toks,
        |    CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_tokens
        |  FROM documents),
        |s1 AS (SELECT * FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))
        |      ORDER BY doc_id) AS rn FROM meas) WHERE rn = 1),
        |s2 AS (SELECT * FROM s1 WHERE n_tokens >= 20),
        |s3 AS (SELECT * FROM s2 WHERE lang IN ('en', 'zh', 'de')),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    ('0x' || substring(md5(sg), 1, 8))::BIGINT AS h
        |  FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(generate_series(1, len(toks)-2),
        |        i -> array_to_string(toks[i:i+2], ' '))) AS sg
        |    FROM s3 WHERE len(toks) >= 3)),
        |m AS (
        |  SELECT doc_id,
        |$minExprs
        |  FROM sh GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, 1 AS band_no,
        |    md5(m1::VARCHAR || '|' || m2::VARCHAR || '|' || m3::VARCHAR
        |      || '|' || m4::VARCHAR) AS bk FROM m
        |  UNION ALL
        |  SELECT doc_id, 2,
        |    md5(m5::VARCHAR || '|' || m6::VARCHAR || '|' || m7::VARCHAR
        |      || '|' || m8::VARCHAR) FROM m),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
        |  FROM bands x JOIN bands y ON x.band_no = y.band_no
        |    AND x.bk = y.bk AND x.doc_id < y.doc_id),
        |c AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
        |dropnear AS (
        |  SELECT DISTINCT i.d2 AS doc_id FROM (
        |    SELECT cand.d1, cand.d2, CAST(COUNT(*) AS BIGINT) AS inter
        |    FROM cand JOIN sh a ON a.doc_id = cand.d1
        |      JOIN sh b ON b.doc_id = cand.d2 AND b.h = a.h
        |    GROUP BY 1, 2) i
        |  JOIN c c1 ON i.d1 = c1.doc_id JOIN c c2 ON i.d2 = c2.doc_id
        |  WHERE CAST(inter AS DOUBLE) / (c1.nsh + c2.nsh - inter) >= 0.7),
        |s4 AS (SELECT * FROM s3
        |  WHERE doc_id NOT IN (SELECT doc_id FROM dropnear)),
        |s4b AS (SELECT *,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 100 AS bucket
        |  FROM s4),
        |sh8 AS (
        |  SELECT DISTINCT doc_id, md5(sg) AS h8 FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(generate_series(1, len(toks)-7),
        |        i -> array_to_string(toks[i:i+7], ' '))) AS sg
        |    FROM s4b WHERE len(toks) >= 8)),
        |held AS (
        |  SELECT DISTINCT sh8.h8 FROM s4b JOIN sh8 ON sh8.doc_id = s4b.doc_id
        |  WHERE s4b.bucket >= 80),
        |contaminated AS (
        |  SELECT DISTINCT sh8.doc_id FROM sh8 JOIN held ON held.h8 = sh8.h8),
        |s5 AS (SELECT * FROM s4b WHERE bucket < 80
        |  AND doc_id NOT IN (SELECT doc_id FROM contaminated))
        |SELECT * FROM (
        |  SELECT 0 AS stage_no, 'raw' AS stage,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS sum_tokens
        |  FROM meas
        |  UNION ALL SELECT 1, 'exact_dedup', CAST(COUNT(*) AS BIGINT),
        |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s1
        |  UNION ALL SELECT 2, 'quality_min20', CAST(COUNT(*) AS BIGINT),
        |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s2
        |  UNION ALL SELECT 3, 'lang_en_zh_de', CAST(COUNT(*) AS BIGINT),
        |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s3
        |  UNION ALL SELECT 4, 'near_dedup_j07', CAST(COUNT(*) AS BIGINT),
        |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s4
        |  UNION ALL SELECT 5, 'train_decontaminated',
        |    CAST(COUNT(*) AS BIGINT),
        |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s5)
        |ORDER BY stage_no""".stripMargin
      },
      "the composed pretraining-prep funnel: dedup -> gates -> near-dup " +
        "-> split -> decontamination, per-stage yields, oracle-replayed " +
        "end to end"),

    // DSIR-style data selection via importance resampling (Xie et al.
    // 2023, "Data Selection for Language Models via Importance
    // Resampling"): score each raw-pool document by how much its hashed
    // n-gram distribution looks like a TARGET domain (here src0, the
    // curated-slice stand-in) vs the raw pool itself, then keep the
    // top-k. Features are hashed BIGRAMS in 64 md5 buckets (the
    // q_perceptron / q_feature_hash hashing, applied to q_textrank's
    // zipped-bigram explode); the per-bucket log importance ratio is
    // Laplace-smoothed ln[(ct_T+1)/(N_T+64) / ((ct_S+1)/(N_S+64))],
    // frozen to MICRO-LOG-UNITS (round(ln(r)*1e6) as BIGINT, the
    // engine's micro-unit recipe) so each document's weight is an exact
    // INTEGER dot product n_b . lr6_b — both engines take ln of the same
    // rational number, and a 1-ulp ln divergence sits ~1e-9 away from
    // any rounding boundary. Scale shape: ONE corpus-sized bigram
    // explode feeds (a) two 64-row bucket marginals + two 1-row totals
    // (broadcast-sized model state — this IS DSIR's draw: the importance
    // model is a fixed-width table, never corpus-sized), and (b) a
    // (doc,bucket) partial-agg; scoring is a broadcast join + one
    // doc-keyed sum; the top-k cut is TakeOrderedAndProject, no global
    // sort. At 100 TB the only shuffle that grows with the corpus is the
    // (doc,bucket) aggregation — bounded at 64 rows per document.
    "q_dsir" -> GQuery(
      (s, d) => {
        import s.implicits._
        val fb = spread(Tables.load(s, d, "documents"))
          .select($"doc_id", $"source", tokens($"text").as("toks"))
          .filter(size($"toks") >= 2)
          .select($"doc_id", $"source", explode(expr(
            "transform(sequence(1, size(toks)-1), " +
              "i -> concat(element_at(toks, i), ' ', element_at(toks, i+1)))"))
            .as("bg"))
          .withColumn("bucket",
            pmod(conv(substring(md5($"bg"), 1, 8), 16, 10).cast("long"),
              lit(64L)))
          // r15 materialized fb here (5 consumers); r16 re-adjudicated
          // at the driver's local[32] config: the lazy form wins
          // (isolated min-of-5: 0.84 vs 0.93 s) — each consumer
          // partial-aggregates before its shuffle, so the duplicate
          // map work parallelizes inside one job while a checkpoint
          // adds a barrier + copy (and a shared repartition shuffles
          // the full bigram table: 1.19 s, worse still). The bigram
          // string is still projected away before the fan-out (§2.3)
          .select($"doc_id", $"source", $"bucket")
        val tgt = fb.filter($"source" === "src0")
        val raw = fb.filter($"source" =!= "src0")
        val tc = tgt.groupBy($"bucket").agg(count(lit(1)).as("ct"))
        val sc = raw.groupBy($"bucket").agg(count(lit(1)).as("cs"))
        val nt = tgt.agg(count(lit(1)).cast("double").as("n_t"))
        val ns = raw.agg(count(lit(1)).cast("double").as("n_s"))
        val lr = s.range(64).toDF("bucket")
          .join(tc, Seq("bucket"), "left")
          .join(sc, Seq("bucket"), "left")
          .crossJoin(broadcast(nt)).crossJoin(broadcast(ns))
          .select($"bucket",
            round(log(
              (coalesce($"ct", lit(0L)).cast("double") + lit(1.0)) /
                ($"n_t" + lit(64.0)) *
                (($"n_s" + lit(64.0)) /
                  (coalesce($"cs", lit(0L)).cast("double") + lit(1.0)))) *
              lit(1e6), 0).cast("long").as("lr6"))
        raw.groupBy($"doc_id", $"source", $"bucket")
          .agg(count(lit(1)).as("n"))
          .join(broadcast(lr), "bucket")
          .groupBy($"doc_id", $"source")
          .agg(sum($"n" * $"lr6").as("dsir_w6"))
          .orderBy($"dsir_w6".desc, $"doc_id")
          .limit(50)
          .select($"doc_id", $"source", $"dsir_w6")
      },
      Some(s"""WITH fb AS (
        |  SELECT doc_id, source,
        |    ('0x' || substring(md5(bg), 1, 8))::BIGINT % 64 AS bucket
        |  FROM (
        |    SELECT doc_id, source,
        |      toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT)+1] AS bg
        |    FROM (SELECT doc_id, source, ${sqlTokens("text")} AS toks
        |          FROM documents) t,
        |      unnest(generate_series(1, len(toks)-1)) AS u(i)
        |    WHERE len(toks) >= 2)),
        |tc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct
        |       FROM fb WHERE source = 'src0' GROUP BY 1),
        |sc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cs
        |       FROM fb WHERE source <> 'src0' GROUP BY 1),
        |nt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_t
        |       FROM fb WHERE source = 'src0'),
        |ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_s
        |       FROM fb WHERE source <> 'src0'),
        |lr AS (
        |  SELECT r.range AS bucket,
        |    CAST(round(ln(
        |      (CAST(COALESCE(tc.ct, 0) AS DOUBLE) + 1.0) / (nt.n_t + 64.0)
        |        * ((ns.n_s + 64.0) /
        |           (CAST(COALESCE(sc.cs, 0) AS DOUBLE) + 1.0))) * 1e6, 0)
        |      AS BIGINT) AS lr6
        |  FROM range(64) r
        |  LEFT JOIN tc ON tc.bucket = r.range
        |  LEFT JOIN sc ON sc.bucket = r.range
        |  CROSS JOIN nt CROSS JOIN ns),
        |db AS (
        |  SELECT doc_id, any_value(source) AS source, bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM fb WHERE source <> 'src0' GROUP BY doc_id, bucket)
        |SELECT db.doc_id, any_value(db.source) AS source,
        |  CAST(SUM(db.n * lr.lr6) AS BIGINT) AS dsir_w6
        |FROM db JOIN lr USING (bucket)
        |GROUP BY db.doc_id
        |ORDER BY dsir_w6 DESC, db.doc_id LIMIT 50""".stripMargin),
      "DSIR importance-resampling selection: hashed-bigram importance " +
        "weights vs a target domain, integer-exact top-k"),

    // The DSIR SELECTION REPORT: q_dsir ranks documents; this query
    // applies the production selection RULE (keep a doc iff its mean
    // per-bigram importance clears a threshold — the all-integer
    // `w6 >= thr * n_bigrams` comparison [[DsirSelect]] uses) and
    // reports per-source yields: how many docs each source would
    // contribute post-selection and at what mean importance — the knob
    // table a data lead reads before committing a mixture. Same frozen
    // 64-bucket model and integer dot products as q_dsir (identical
    // determinism story); the report adds only a per-source rollup, so
    // the corpus-scale work is unchanged: one bigram explode + one
    // (doc,bucket) agg.
    "q_dsir_select" -> GQuery(
      (s, d) => {
        import s.implicits._
        val fb = spread(Tables.load(s, d, "documents"))
          .select($"doc_id", $"source", tokens($"text").as("toks"))
          .filter(size($"toks") >= 2)
          .select($"doc_id", $"source", explode(expr(
            "transform(sequence(1, size(toks)-1), " +
              "i -> concat(element_at(toks, i), ' ', element_at(toks, i+1)))"))
            .as("bg"))
          .withColumn("bucket",
            pmod(conv(substring(md5($"bg"), 1, 8), 16, 10).cast("long"),
              lit(64L)))
          // r15 materialized fb here (5 consumers); r16 re-adjudicated
          // at the driver's local[32] config: the lazy form wins
          // (isolated min-of-5: 0.84 vs 0.93 s) — each consumer
          // partial-aggregates before its shuffle, so the duplicate
          // map work parallelizes inside one job while a checkpoint
          // adds a barrier + copy (and a shared repartition shuffles
          // the full bigram table: 1.19 s, worse still). The bigram
          // string is still projected away before the fan-out (§2.3)
          .select($"doc_id", $"source", $"bucket")
        val tgt = fb.filter($"source" === "src0")
        val raw = fb.filter($"source" =!= "src0")
        val tc = tgt.groupBy($"bucket").agg(count(lit(1)).as("ct"))
        val sc = raw.groupBy($"bucket").agg(count(lit(1)).as("cs"))
        val nt = tgt.agg(count(lit(1)).cast("double").as("n_t"))
        val ns = raw.agg(count(lit(1)).cast("double").as("n_s"))
        val lr = s.range(64).toDF("bucket")
          .join(tc, Seq("bucket"), "left")
          .join(sc, Seq("bucket"), "left")
          .crossJoin(broadcast(nt)).crossJoin(broadcast(ns))
          .select($"bucket",
            round(log(
              (coalesce($"ct", lit(0L)).cast("double") + lit(1.0)) /
                ($"n_t" + lit(64.0)) *
                (($"n_s" + lit(64.0)) /
                  (coalesce($"cs", lit(0L)).cast("double") + lit(1.0)))) *
              lit(1e6), 0).cast("long").as("lr6"))
        raw.groupBy($"doc_id", $"source", $"bucket")
          .agg(count(lit(1)).as("n"))
          .join(broadcast(lr), "bucket")
          .groupBy($"doc_id", $"source")
          .agg(sum($"n" * $"lr6").as("w6"), sum($"n").as("nb"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum(($"w6" >= lit(100L) * $"nb").cast("long"))
              .as("n_selected"),
            sum($"w6").as("sw6"), sum($"nb").as("snb"))
          .select($"source", $"n_docs", $"n_selected",
            expr("CAST(round(CAST(sw6 AS DOUBLE) / CAST(snb AS DOUBLE), " +
              "0) AS BIGINT)").as("mean_w_micro"),
            expr("CAST(round(CAST(n_selected AS DOUBLE) / " +
              "CAST(n_docs AS DOUBLE) * 1000000.0, 0) AS BIGINT)")
              .as("sel_pct_micro"))
          .orderBy($"source")
      },
      Some(s"""WITH fb AS (
        |  SELECT doc_id, source,
        |    ('0x' || substring(md5(bg), 1, 8))::BIGINT % 64 AS bucket
        |  FROM (
        |    SELECT doc_id, source,
        |      toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT)+1] AS bg
        |    FROM (SELECT doc_id, source, ${sqlTokens("text")} AS toks
        |          FROM documents) t,
        |      unnest(generate_series(1, len(toks)-1)) AS u(i)
        |    WHERE len(toks) >= 2)),
        |tc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct
        |       FROM fb WHERE source = 'src0' GROUP BY 1),
        |sc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cs
        |       FROM fb WHERE source <> 'src0' GROUP BY 1),
        |nt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_t
        |       FROM fb WHERE source = 'src0'),
        |ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_s
        |       FROM fb WHERE source <> 'src0'),
        |lr AS (
        |  SELECT r.range AS bucket,
        |    CAST(round(ln(
        |      (CAST(COALESCE(tc.ct, 0) AS DOUBLE) + 1.0) / (nt.n_t + 64.0)
        |        * ((ns.n_s + 64.0) /
        |           (CAST(COALESCE(sc.cs, 0) AS DOUBLE) + 1.0))) * 1e6, 0)
        |      AS BIGINT) AS lr6
        |  FROM range(64) r
        |  LEFT JOIN tc ON tc.bucket = r.range
        |  LEFT JOIN sc ON sc.bucket = r.range
        |  CROSS JOIN nt CROSS JOIN ns),
        |db AS (
        |  SELECT doc_id, any_value(source) AS source, bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM fb WHERE source <> 'src0' GROUP BY doc_id, bucket),
        |ds AS (
        |  SELECT db.doc_id, any_value(db.source) AS source,
        |    CAST(SUM(db.n * lr.lr6) AS BIGINT) AS w6,
        |    CAST(SUM(db.n) AS BIGINT) AS nb
        |  FROM db JOIN lr USING (bucket) GROUP BY db.doc_id)
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN w6 >= 100 * nb THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_selected,
        |  CAST(round(CAST(SUM(w6) AS DOUBLE) / CAST(SUM(nb) AS DOUBLE),
        |    0) AS BIGINT) AS mean_w_micro,
        |  CAST(round(CAST(SUM(CASE WHEN w6 >= 100 * nb THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1000000.0, 0)
        |    AS BIGINT) AS sel_pct_micro
        |FROM ds GROUP BY source ORDER BY source""".stripMargin),
      "DSIR selection-yield report: per-source kept counts and mean " +
        "importance under the thresholded integer rule"),

    // Sequence packing (GPT-style concat-and-chunk): the step between a
    // cleaned corpus and a training run — documents are concatenated in
    // a deterministic order and cut into fixed 2048-token blocks, and
    // the packing report says how many blocks each source yields, how
    // many docs straddle a block boundary (attention-mask pollution
    // unless the loader resets), and how much tail padding the last
    // block carries. Per-source token streams (the sharding real
    // loaders use); doc offsets are a cumulative sum over a KEYED
    // window (partitioned by source — never a single global ordered
    // window), and every output is an exact integer. Scale shape: one
    // scan, one keyed-window shuffle, one per-source aggregation; at
    // 100 TB sources sub-shard and the window key carries the shard.
    "q_seq_packing" -> GQuery(
      (s, d) => {
        import s.implicits._
        val C = 2048L
        val w = Window.partitionBy($"source").orderBy($"doc_id")
        Tables.load(s, d, "documents")
          .select($"doc_id", $"source",
            size(tokens($"text")).cast("long").as("n"))
          .filter($"n" > 0)
          .withColumn("cum", sum($"n").over(w))
          .withColumn("first_b", expr(s"(cum - n) div $C"))
          .withColumn("last_b", expr(s"(cum - 1) div $C"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n").as("n_tokens"),
            (max($"last_b") + 1L).as("n_blocks"),
            sum(($"last_b" > $"first_b").cast("long")).as("n_straddle"),
            ((max($"last_b") + 1L) * C - max($"cum")).as("pad_tokens"))
          .orderBy($"source")
      },
      Some(s"""WITH docs AS (
        |  SELECT doc_id, source,
        |    CAST(len(${sqlTokens("text")}) AS BIGINT) AS n
        |  FROM documents),
        |offs AS (
        |  SELECT source, n,
        |    SUM(n) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM docs WHERE n > 0)
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  CAST(MAX((cum - 1) // 2048) + 1 AS BIGINT) AS n_blocks,
        |  CAST(SUM(CASE WHEN (cum - 1) // 2048 > (cum - n) // 2048
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle,
        |  CAST((MAX((cum - 1) // 2048) + 1) * 2048 - MAX(cum) AS BIGINT)
        |    AS pad_tokens
        |FROM offs GROUP BY source ORDER BY source""".stripMargin),
      "sequence packing report: concat-and-chunk 2048-token blocks per " +
        "source, straddle and padding accounting"),

    // Sliding-window chunking (the RAG / embedding-index prep op):
    // size-256 stride-192 windows over each doc's token stream. The
    // chunk count and the emitted-token total have ALL-INTEGER closed
    // forms (c = (n-65) div 192 + 1 for n > 256, i.e. ceil((n-256)/192)
    // + 1; emitted = n + 64*(c-1) — each extra chunk re-emits the
    // 64-token overlap), so the whole report is one scan + per-source
    // aggregation of integer per-row expressions: no explode, no
    // window, nothing grows with chunk count. The duplication factor
    // (emitted/input) is the index-size multiplier chunking costs,
    // emitted in micro-units.
    "q_chunk_overlap" -> GQuery(
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "documents")
          .select($"source", size(tokens($"text")).cast("long").as("n"))
          .filter($"n" > 0)
          .withColumn("c",
            when($"n" <= 256L, 1L)
              .otherwise(expr("(n - 65) div 192 + 1")))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n").as("tokens_in"),
            sum($"c").as("n_chunks"),
            sum($"n" + ($"c" - 1L) * 64L).as("tokens_emitted"))
          .withColumn("dup_factor_micro",
            expr("CAST(round(CAST(tokens_emitted AS DOUBLE) / " +
              "CAST(tokens_in AS DOUBLE) * 1000000.0, 0) AS BIGINT)"))
          .orderBy($"source")
      },
      Some(s"""WITH docs AS (
        |  SELECT source, CAST(len(${sqlTokens("text")}) AS BIGINT) AS n
        |  FROM documents),
        |ch AS (
        |  SELECT source, n,
        |    CASE WHEN n <= 256 THEN 1
        |      ELSE (n - 65) // 192 + 1 END AS c
        |  FROM docs WHERE n > 0)
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS tokens_in,
        |  CAST(SUM(c) AS BIGINT) AS n_chunks,
        |  CAST(SUM(n + 64 * (c - 1)) AS BIGINT) AS tokens_emitted,
        |  CAST(round(CAST(SUM(n + 64 * (c - 1)) AS DOUBLE) /
        |    CAST(SUM(n) AS DOUBLE) * 1000000.0, 0) AS BIGINT)
        |    AS dup_factor_micro
        |FROM ch GROUP BY source ORDER BY source""".stripMargin),
      "sliding-window chunking report: 256/192 windows, closed-form " +
        "chunk and overlap accounting"),
  )
}
