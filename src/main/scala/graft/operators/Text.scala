package graft.operators

import graft.{Fns, GQuery, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import Checkpoint.CutOps

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline extension tier (SURVEY.md §2.11 X4): tokenization,
  * quality scoring, language-ID heuristic, BPE-ish token counting, document
  * fingerprinting.
  *
  * Scale notes: every query here is a narrow projection + per-row expression
  * work (no shuffle except the final aggregations), so it scales linearly
  * with input splits; all expressions are built-in higher-order functions
  * that stay inside whole-stage codegen — no UDFs.
  */
object Text {
  import Fns._

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  /** Small per-language stopword lexicons for the language-ID heuristic.
    * Deterministic, embedded (a lexicon broadcast join would be the shape at
    * scale for large lexicons — see q_word_counts for the join-free path). */
  private val langLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "es" -> Seq("el", "la", "los", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist", "zu"),
    "fr" -> Seq("le", "les", "des", "et", "est", "une"))

  private def sqlInList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  /** BPE-ish tokenizer regex: letter runs | digit runs | single non-space
    * symbol. Same syntax/semantics in Java regex (Spark) and RE2 (DuckDB). */
  private val bpeRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  val queries: Seq[(String, GQuery)] = Seq(

    // X4 tokenization: whitespace token + distinct-token counts per doc.
    "q_text_tokens" -> GQuery(
      (s, d) => {
        import s.implicits._
        docs(s, d)
          .withColumn("toks", tokens($"text"))
          .select(
            $"doc_id",
            size($"toks").as("n_tokens"),
            size(array_distinct($"toks")).as("n_distinct_tokens"))
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id,
        |  CAST(len(${sqlTokens("text")}) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(${sqlTokens("text")})) AS INT) AS n_distinct_tokens
        |FROM documents ORDER BY doc_id""".stripMargin),
      "whitespace tokenization + counts (extension X4)"),

    // X4 corpus word frequencies: explode + count — the map-side-combine
    // shape (partial agg per partition, tiny shuffle of distinct words).
    "q_word_counts" -> GQuery(
      (s, d) => {
        import s.implicits._
        docs(s, d)
          .select(explode(tokens($"text")).as("token"))
          .groupBy($"token")
          .agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"token")
          .limit(30)
      },
      Some(s"""SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(${sqlTokens("text")}) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 30""".stripMargin),
      "corpus token frequency top-k (extension X4)"),

    // X4 quality scoring: length/token/stopword-ratio heuristics. All
    // integer counts divided as doubles — bit-identical across engines.
    "q_text_quality" -> GQuery(
      (s, d) => {
        import s.implicits._
        val stop = langLexicons.toMap.apply("en")
        docs(s, d)
          .withColumn("toks", tokens($"text"))
          .select(
            $"doc_id",
            length($"text").as("n_chars"),
            size($"toks").as("n_tokens"),
            (aggregate($"toks", lit(0L), (acc, x) => acc + length(x))
              .cast("double") / size($"toks")).as("avg_token_len"),
            (size(filter($"toks", t => t.isInCollection(stop)))
              .cast("double") / size($"toks")).as("stopword_ratio"),
            (size(filter($"toks", t => length(t) > 4))
              .cast("double") / size($"toks")).as("long_token_ratio"))
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id,
        |  CAST(len(text) AS INT) AS n_chars,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks) AS avg_token_len,
        |  CAST(len(list_filter(toks, t -> t IN ${sqlInList(langLexicons.toMap.apply("en"))})) AS DOUBLE) / len(toks) AS stopword_ratio,
        |  CAST(len(list_filter(toks, t -> len(t) > 4)) AS DOUBLE) / len(toks) AS long_token_ratio
        |FROM (SELECT doc_id, text, ${sqlTokens("text")} AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin),
      "document quality metrics (extension X4)"),

    // X4 language ID: stopword-lexicon hit ratio per language, argmax with
    // fixed tie-break order (en > es > de > fr).
    //
    // Shape: the lexicon is a broadcast dim table joined against exploded
    // tokens, scored with conditional sums — one scan, one doc-keyed partial
    // agg, everything inside whole-stage codegen. The previous formulation
    // (four `filter(toks, t.isInCollection(ws))` passes) kept identical
    // values but ran interpreted — higher-order array functions have no
    // codegen — and cost ~5 s at sf0.1 (VERDICT r3 #4). Counts here are the
    // same integers (a token matching lexicon L contributes 1 to L's sum,
    // duplicates included), so the oracle SQL is unchanged.
    "q_lang_id" -> GQuery(
      (s, d) => {
        import s.implicits._
        val lex = {
          // distinct guards the join's one-hit-per-token contract: a
          // duplicate word inside a language's lexicon Seq would fan out
          // the join and double-count that token (ADVICE r4).
          val rows = langLexicons
            .flatMap { case (lg, ws) => ws.distinct.map((_, lg)) }
          s.createDataFrame(rows).toDF("word", "lg")
        }
        val hits = docs(s, d)
          .withColumn("toks", tokens($"text"))
          // explode_outer keeps empty-token docs as a null word row (no
          // lexicon match), preserving the old per-doc row count.
          .select($"doc_id", $"lang", size($"toks").as("n_toks"),
            explode_outer($"toks").as("word"))
          .join(broadcast(lex), Seq("word"), "left")
          .groupBy($"doc_id", $"lang", $"n_toks")
          .agg(
            sum(when($"lg" === "en", 1).otherwise(0)).as("h_en"),
            sum(when($"lg" === "es", 1).otherwise(0)).as("h_es"),
            sum(when($"lg" === "de", 1).otherwise(0)).as("h_de"),
            sum(when($"lg" === "fr", 1).otherwise(0)).as("h_fr"))
        val scored = hits.select(
          $"doc_id", $"lang",
          ($"h_en".cast("double") / $"n_toks").as("score_en"),
          ($"h_es".cast("double") / $"n_toks").as("score_es"),
          ($"h_de".cast("double") / $"n_toks").as("score_de"),
          ($"h_fr".cast("double") / $"n_toks").as("score_fr"))
        scored.select(
          $"doc_id", $"lang",
          $"score_en", $"score_es", $"score_de", $"score_fr",
          when($"score_en" >= $"score_es" && $"score_en" >= $"score_de" &&
               $"score_en" >= $"score_fr", "en")
            .when($"score_es" >= $"score_de" && $"score_es" >= $"score_fr", "es")
            .when($"score_de" >= $"score_fr", "de")
            .otherwise("fr").as("predicted"))
          .withColumn("is_correct", $"predicted" === $"lang")
          .orderBy($"doc_id")
      },
      Some {
        val scores = langLexicons.map { case (lg, ws) =>
          s"CAST(len(list_filter(toks, t -> t IN ${sqlInList(ws)})) AS DOUBLE) / len(toks) AS score_$lg"
        }.mkString(",\n  ")
        s"""SELECT doc_id, lang, score_en, score_es, score_de, score_fr,
        |  CASE
        |    WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr THEN 'en'
        |    WHEN score_es >= score_de AND score_es >= score_fr THEN 'es'
        |    WHEN score_de >= score_fr THEN 'de'
        |    ELSE 'fr' END AS predicted,
        |  (CASE
        |    WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr THEN 'en'
        |    WHEN score_es >= score_de AND score_es >= score_fr THEN 'es'
        |    WHEN score_de >= score_fr THEN 'de'
        |    ELSE 'fr' END) = lang AS is_correct
        |FROM (SELECT doc_id, lang, $scores
        |      FROM (SELECT doc_id, lang, ${sqlTokens("text")} AS toks FROM documents))
        |ORDER BY doc_id""".stripMargin
      },
      "n-gram/stopword language-ID heuristic (extension X4)"),

    // X4 BPE-ish token counting via regexp_extract_all vs whitespace count.
    "q_token_count" -> GQuery(
      (s, d) => {
        import s.implicits._
        docs(s, d)
          .select(
            $"doc_id",
            size(tokens($"text")).as("n_ws_tokens"),
            // Column API, not expr(): a SQL literal would re-escape \s.
            size(regexp_extract_all($"text", lit(bpeRe), lit(0)))
              .as("n_bpe_tokens"))
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id,
        |  CAST(len(${sqlTokens("text")}) AS INT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '$bpeRe')) AS INT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin),
      "BPE-ish regex token counting (extension X4)"),

    // X4 document fingerprinting: md5 over whitespace-normalized text — the
    // exact-dedup key (q_dedup_exact consumes the same expression).
    "q_fingerprint" -> GQuery(
      (s, d) => {
        import s.implicits._
        docs(s, d)
          .select(
            $"doc_id",
            md5(regexp_replace(lower($"text"), "\\s+", " ")).as("fp"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
        |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin),
      "content fingerprint via normalized md5 (extension X4)"),

    // X4 TF-IDF from ONE corpus scan: term frequency via explode+groupBy
    // (map-side partials); document frequency as a window count over the
    // tf table (tf has exactly one row per distinct (doc, word), so
    // count-over-partition(word) IS df) — no second scan, no join, just
    // one agg shuffle + one word-keyed window exchange. Corpus size
    // broadcasts as a one-row cross join. Integer counts + one ln() in
    // identical expression order keep it engine-exact. Top-20
    // highest-scoring (doc, term) pairs, totally ordered.
    "q_tfidf" -> GQuery(
      (s, d) => {
        import s.implicits._
        val words = docs(s, d)
          .select($"doc_id", explode(graft.Fns.tokens($"text")).as("word"))
        val tf = words.groupBy($"doc_id", $"word")
          .agg(count(lit(1)).as("tf"))
        val byWord = org.apache.spark.sql.expressions.Window.partitionBy($"word")
        val n = docs(s, d).agg(count(lit(1)).as("n_docs"))
        tf.withColumn("df", count(lit(1)).over(byWord))
          .crossJoin(broadcast(n))
          .select($"doc_id", $"word",
            ($"tf".cast("double") *
              log($"n_docs".cast("double") / $"df")).as("tfidf"))
          .orderBy($"tfidf".desc, $"doc_id", $"word")
          .limit(20)
      },
      Some("""WITH w AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'), t -> t != '')) AS word
        |  FROM documents),
        |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2),
        |df AS (SELECT word, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, word FROM w) GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT doc_id, word,
        |  CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / df) AS tfidf
        |FROM tf JOIN df USING (word), n
        |ORDER BY tfidf DESC, doc_id, word LIMIT 20""".stripMargin),
      "TF-IDF top terms (extension X4)"),

    // X4 PII redaction: email/phone patterns replaced with placeholder
    // tags — the scrub pass a training pipeline runs before tokenization.
    // The synthetic corpus has no PII, so each engine deterministically
    // INJECTS an email + phone built from doc_id into the text first, then
    // scrubs — proving the redaction fires, not just that it's a no-op.
    // Patterns use only syntax shared by Java regex and RE2.
    // Redaction proof is emitted as PER-ROW BOOLEANS (hash-checked by the
    // oracle) rather than an always-true filter: the old WHERE-on-alias
    // form got inlined by predicate pushdown and priced the 2-regex chain
    // 4x per row (plan showed 8 regexp_replace calls); flags referencing
    // the aliased `clean` keep CollapseProject away (non-cheap alias used
    // 3x), so the chain runs ONCE per row and the verification got
    // stronger — the oracle now compares the fired/not-fired bit per doc
    // instead of relying on row presence.
    "q_pii_scrub" -> GQuery(
      (s, d) => {
        import s.implicits._
        val emailRe = "[A-Za-z0-9._]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phoneRe = "\\+[0-9]{2}-[0-9]{3}-[0-9]{4}"
        docs(s, d)
          .withColumn("dirty",
            concat($"text", lit(" contact user"), $"doc_id",
              lit("@example.com or +12-555-010"), pmod($"doc_id", lit(10))))
          .select($"doc_id",
            regexp_replace(regexp_replace($"dirty", emailRe, "<EMAIL>"),
              phoneRe, "<PHONE>").as("clean"))
          .select($"doc_id", $"clean",
            $"clean".contains("<EMAIL>").as("email_scrubbed"),
            $"clean".contains("<PHONE>").as("phone_scrubbed"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, clean,
        |  contains(clean, '<EMAIL>') AS email_scrubbed,
        |  contains(clean, '<PHONE>') AS phone_scrubbed
        |FROM (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(
        |        text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |          '@example.com or +12-555-010' ||
        |          CAST(doc_id % 10 AS VARCHAR),
        |        '[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |        '<EMAIL>', 'g'),
        |      '\+[0-9]{2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin),
      "PII email/phone redaction (extension X4)"),

    // X4 repetition ratio — the Gopher-style quality signal: fraction of
    // tokens that are repeats of an earlier token in the same doc.
    // 1 - distinct/total, exact rational on both engines.
    "q_repetition" -> GQuery(
      (s, d) => {
        import s.implicits._
        docs(s, d)
          .withColumn("toks", tokens($"text"))
          .filter(size($"toks") > 0)
          .select($"doc_id",
            (lit(1.0) - size(array_distinct($"toks")).cast("double") /
              size($"toks")).as("rep_ratio"))
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id,
        |  1.0 - CAST(len(list_distinct(${sqlTokens("text")})) AS DOUBLE) /
        |    len(${sqlTokens("text")}) AS rep_ratio
        |FROM documents WHERE len(${sqlTokens("text")}) > 0
        |ORDER BY doc_id""".stripMargin),
      "token repetition-ratio quality signal (extension X4)"),

    // X4 bigram counts: adjacent-token pairs via an index transform over
    // the token array (no self-join), then the usual partial-agg count.
    // Top-20, totally ordered.
    "q_bigrams" -> GQuery(
      (s, d) => {
        import s.implicits._
        docs(s, d)
          .withColumn("toks", tokens($"text"))
          .select(explode(expr(
            "transform(sequence(1, size(toks)-1), " +
              "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i+1)))"))
            .as("bigram"))
          .groupBy($"bigram").agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"bigram")
          .limit(20)
      },
      Some(s"""WITH t AS (
        |  SELECT ${sqlTokens("text")} AS toks FROM documents),
        |b AS (
        |  SELECT toks[i] || ' ' || toks[i+1] AS bigram
        |  FROM t, unnest(generate_series(1, len(toks)-1)) AS u(i)
        |  WHERE len(toks) > 1)
        |SELECT bigram, COUNT(*) AS n FROM b GROUP BY 1
        |ORDER BY n DESC, bigram LIMIT 20""".stripMargin),
      "adjacent-token bigram counts (extension X4)"),

    // X4 edit-distance similarity: levenshtein of every part name against
    // a probe string, top-20 closest — linear scan (never pairwise n²; the
    // pairwise tier is the LSH/blocked path, operators/Dedup). Both
    // engines implement unit-cost Levenshtein — identical integers.
    "q_levenshtein" -> GQuery(
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "part")
          .select($"p_partkey", $"p_name",
            levenshtein($"p_name", lit("spring green yellow purple"))
              .as("dist"))
          .orderBy($"dist", $"p_partkey")
          .limit(20)
      },
      Some("""SELECT p_partkey, p_name,
        |  levenshtein(p_name, 'spring green yellow purple') AS dist
        |FROM part ORDER BY dist, p_partkey LIMIT 20""".stripMargin),
      "edit-distance similarity vs a probe string (extension X4)"),

    // X4 collocation mining: PMI over adjacent token bigrams. All counts
    // are exact integers; the sort key is the PMI *lift* ratio computed as
    // ONE IEEE division of exact integer products (deterministic across
    // engines, unlike summed doubles or libm log ordering); ln(lift) is
    // display-rounded to 6 dp. Bigram/unigram tables join on token —
    // ordinary keyed shuffles, linear in corpus size; the min-count filter
    // prunes the long tail before the joins.
    "q_pmi_bigrams" -> GQuery(
      (s, d) => {
        import s.implicits._
        val toks = docs(s, d)
          .select($"doc_id", tokens($"text").as("toks"))
        val uni = toks.select(explode($"toks").as("tok"))
          .groupBy($"tok").agg(count(lit(1)).as("cnt"))
        val big = toks.filter(size($"toks") >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(toks)-1), i -> struct(element_at(toks, i) AS w1, element_at(toks, i+1) AS w2))"))
            .as("bg"))
          .select($"bg.w1", $"bg.w2")
          .groupBy($"w1", $"w2").agg(count(lit(1)).as("n_ab"))
          .filter($"n_ab" >= 5)
        val totals = uni.agg(sum($"cnt").as("t_uni")).crossJoin(
          big.agg(sum($"n_ab").as("t_big")))
        big
          .join(uni.withColumnRenamed("tok", "w1")
            .withColumnRenamed("cnt", "n_a"), "w1")
          .join(uni.withColumnRenamed("tok", "w2")
            .withColumnRenamed("cnt", "n_b"), "w2")
          .crossJoin(broadcast(totals))
          .select($"w1", $"w2", $"n_ab",
            (($"n_ab" * $"t_uni" * $"t_uni").cast("double") /
              ($"t_big" * $"n_a" * $"n_b")).as("lift"))
          .withColumn("pmi", round(log($"lift"), 6))
          .orderBy($"lift".desc, $"w1", $"w2")
          .limit(20)
      },
      Some(s"""WITH toks AS (
        |  SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents),
        |uni AS (
        |  SELECT tok, COUNT(*) AS cnt
        |  FROM (SELECT unnest(toks) AS tok FROM toks) GROUP BY tok),
        |big AS (
        |  SELECT w1, w2, COUNT(*) AS n_ab FROM (
        |    SELECT toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT)+1] AS w2
        |    FROM toks, unnest(generate_series(1, len(toks)-1)) AS u(i)
        |    WHERE len(toks) >= 2)
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |tot AS (
        |  SELECT (SELECT SUM(cnt) FROM uni) AS t_uni,
        |         (SELECT SUM(n_ab) FROM big) AS t_big)
        |SELECT w1, w2, n_ab,
        |  CAST(n_ab * t_uni * t_uni AS DOUBLE) / (t_big * a.cnt * b.cnt)
        |    AS lift,
        |  round(ln(CAST(n_ab * t_uni * t_uni AS DOUBLE)
        |    / (t_big * a.cnt * b.cnt)), 6) AS pmi
        |FROM big JOIN uni a ON big.w1 = a.tok
        |         JOIN uni b ON big.w2 = b.tok, tot
        |ORDER BY lift DESC, w1, w2 LIMIT 20""".stripMargin),
      "PMI collocations over adjacent token bigrams (extension X4)"),

    // X4 Zipf fit: slope of ln(freq) vs ln(rank) over the top-1000
    // vocabulary, via the closed-form least-squares formula on
    // DECIMAL-EXACT sums of 9-dp-rounded logs — summed doubles would
    // diverge between engines' aggregation orders. The global row_number
    // runs over the post-aggregation vocabulary (bounded, like the dim
    // surrogate keys); the corpus-size scan below it is linear.
    "q_zipf_slope" -> GQuery(
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .orderBy($"n".desc, $"tok")
        val ranked = docs(s, d)
          .select(explode(tokens($"text")).as("tok"))
          .groupBy($"tok").agg(count(lit(1)).as("n"))
          .withColumn("rank", row_number().over(w))
          .filter($"rank" <= 1000)
          .select(
            round(log($"rank".cast("double")), 9)
              .cast("decimal(12,9)").as("x"),
            round(log($"n".cast("double")), 9)
              .cast("decimal(12,9)").as("y"))
        // sums stay decimal-EXACT; each sum converts to double once and
        // the slope is pure IEEE double arithmetic. The OUTPUT is
        // integer micro-units: the 9-dp ln freeze can still flip one
        // row's rounding when Spark's and DuckDB's libm ln differ by
        // 1 ulp right at a 0.5e-9 boundary (observed once at sf0.1's
        // vocabulary — a digit-12 slope divergence), and micro-rounding
        // sits 12 orders of magnitude away from that noise.
        ranked.agg(
          count(lit(1)).as("k"),
          sum($"x").cast("double").as("sx"),
          sum($"y").cast("double").as("sy"),
          sum($"x" * $"x").cast("double").as("sxx"),
          sum($"x" * $"y").cast("double").as("sxy"))
          .select($"k",
            expr("CAST(round((k * sxy - sx * sy) / " +
              "(k * sxx - sx * sx) * 1000000.0, 0) AS BIGINT)")
              .as("slope_micro"))
      },
      Some(s"""WITH wc AS (
        |  SELECT tok, COUNT(*) AS n
        |  FROM (SELECT unnest(${sqlTokens("text")}) AS tok
        |        FROM documents) GROUP BY tok),
        |r AS (
        |  SELECT CAST(round(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(12,9)) AS x,
        |         CAST(round(ln(CAST(n AS DOUBLE)), 9) AS DECIMAL(12,9)) AS y
        |  FROM (SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rank
        |        FROM wc) WHERE rank <= 1000),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x*x) AS DOUBLE) AS sxx, CAST(SUM(x*y) AS DOUBLE) AS sxy
        |  FROM r)
        |SELECT k, CAST(round((k * sxy - sx * sy) / (k * sxx - sx * sx)
        |  * 1000000.0, 0) AS BIGINT) AS slope_micro
        |FROM s""".stripMargin),
      "Zipf law slope over the frequency-rank distribution (extension X4)"),

    // X4 Gopher-style quality gates: per-document word count, mean word
    // length, top-token repetition ratio, and stopword presence, each with
    // a keep/drop rule (the pretraining-corpus filter pattern from the
    // Gopher/MassiveText line of work, re-expressed as one exploded
    // aggregation). One scan, one (doc, tok) partial-count shuffle, one
    // doc-keyed rollup — the flags are pure integer/rational arithmetic so
    // both engines agree exactly; the keep rule reads the ROUNDED ratios so
    // threshold comparisons cannot straddle an ulp.
    "q_gopher_rules" -> GQuery(
      (s, d) => {
        import s.implicits._
        val en = langLexicons.toMap.apply("en")
        docs(s, d)
          .select($"doc_id", explode(tokens($"text")).as("tok"))
          .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("cnt"))
          .groupBy($"doc_id")
          .agg(
            sum($"cnt").as("n_words"),
            max($"cnt").as("max_cnt"),
            sum($"cnt" * length($"tok")).as("sum_len"),
            sum(when($"tok".isInCollection(en), $"cnt").otherwise(0L))
              .as("stop_hits"))
          .select(
            $"doc_id", $"n_words",
            round($"sum_len".cast("double") / $"n_words".cast("double"), 6)
              .as("mean_word_len"),
            round($"max_cnt".cast("double") / $"n_words".cast("double"), 6)
              .as("top_tok_ratio"),
            $"stop_hits")
          .select(
            $"doc_id", $"n_words", $"mean_word_len", $"top_tok_ratio",
            $"stop_hits",
            ($"n_words".between(20, 100000) &&
              $"mean_word_len".between(3.0, 10.0) &&
              $"top_tok_ratio" <= 0.2 && $"stop_hits" >= 2).as("keep"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH e AS (
        |  SELECT doc_id, unnest(${sqlTokens("text")}) AS tok FROM documents),
        |c AS (
        |  SELECT doc_id, tok, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
        |g AS (
        |  SELECT doc_id,
        |    CAST(SUM(cnt) AS BIGINT) AS n_words,
        |    CAST(MAX(cnt) AS BIGINT) AS max_cnt,
        |    CAST(SUM(cnt * len(tok)) AS BIGINT) AS sum_len,
        |    CAST(SUM(CASE WHEN tok IN ${sqlInList(langLexicons.toMap.apply("en"))}
        |      THEN cnt ELSE 0 END) AS BIGINT) AS stop_hits
        |  FROM c GROUP BY doc_id),
        |r AS (
        |  SELECT doc_id, n_words,
        |    round(CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
        |      AS mean_word_len,
        |    round(CAST(max_cnt AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
        |      AS top_tok_ratio,
        |    stop_hits
        |  FROM g)
        |SELECT doc_id, n_words, mean_word_len, top_tok_ratio, stop_hits,
        |  (n_words BETWEEN 20 AND 100000
        |    AND mean_word_len BETWEEN 3.0 AND 10.0
        |    AND top_tok_ratio <= 0.2 AND stop_hits >= 2) AS keep
        |FROM r ORDER BY doc_id""".stripMargin),
      "Gopher-style per-document quality gates (extension X4)"),

    // X4 unigram-LM surprisal: train an add-1-smoothed unigram language
    // model on the corpus, score every document by average negative log
    // probability — the cheap perplexity proxy used to quality-filter
    // pretraining data. The LM is a tiny broadcast dim (distinct words);
    // the scoring pass is one scan + one doc-keyed partial agg. Exactness:
    // per-token surprisal is rounded to 9 dp and summed as DECIMAL (the
    // q_zipf_slope recipe), so summation order cannot change the result.
    "q_unigram_surprise" -> GQuery(
      (s, d) => {
        import s.implicits._
        val toks = docs(s, d)
          .select($"doc_id", explode(tokens($"text")).as("tok"))
        val lm = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
        val tot = lm.agg(sum($"cnt").as("t"), count(lit(1)).as("v"))
        val scored = lm.crossJoin(broadcast(tot))
          .select($"tok",
            round(log(($"cnt" + 1).cast("double") /
              ($"t" + $"v").cast("double")), 9)
              .cast("decimal(18,9)").as("s"))
        toks.join(broadcast(scored), "tok")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum($"s").as("ssum"))
          .select($"doc_id", $"n_tokens",
            round(-($"ssum".cast("double")) / $"n_tokens".cast("double"), 6)
              .as("avg_surprise"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH e AS (
        |  SELECT doc_id, unnest(${sqlTokens("text")}) AS tok FROM documents),
        |lm AS (SELECT tok, COUNT(*) AS cnt FROM e GROUP BY tok),
        |tot AS (SELECT SUM(cnt) AS t, COUNT(*) AS v FROM lm),
        |sc AS (
        |  SELECT tok,
        |    CAST(round(ln(CAST(cnt + 1 AS DOUBLE) / CAST(t + v AS DOUBLE)), 9)
        |      AS DECIMAL(18,9)) AS s
        |  FROM lm, tot)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  round(-(CAST(SUM(s) AS DOUBLE)) / CAST(COUNT(*) AS DOUBLE), 6)
        |    AS avg_surprise
        |FROM e JOIN sc USING (tok)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "add-1 unigram-LM average surprisal per document (extension X4)"),

    // word2vec-style negative-sampling table: the unigram distribution
    // raised to the 3/4 power (Mikolov et al. 2013's smoothing — rare
    // words get proportionally MORE negative-sample mass than their raw
    // frequency) over the corpus vocabulary, top 20 by count. The
    // determinism trick: c^0.75 = sqrt(c * sqrt(c)) — two correctly-
    // rounded IEEE sqrts and one multiply instead of a libm pow whose
    // last bits differ across engines; each weight is then 9-dp frozen
    // to DECIMAL so the normalizer is an exact sum. Scale: one token
    // explode + vocab-keyed partial agg (the corpus shuffle); the
    // vocab-grain weight table is checkpointed for its two consumers
    // (normalizer + readout) and the top-20 cut is a TakeOrdered, not
    // a global sort.
    "q_neg_sampling" -> GQuery(
      (s, d) => {
        import s.implicits._
        val cnt = docs(s, d)
          .select(explode(tokens($"text")).as("tok"))
          .groupBy($"tok").agg(count(lit(1)).as("n"))
          .select($"tok", $"n",
            expr("CAST(round(sqrt(CAST(n AS DOUBLE) * " +
              "sqrt(CAST(n AS DOUBLE))), 9) AS DECIMAL(28,9))")
              .as("w9"))
          .localCheckpoint()
        val tot = cnt.agg(sum($"w9").as("tw"))
        cnt.crossJoin(broadcast(tot))
          .select($"tok", $"n",
            expr("CAST(round(CAST(w9 AS DOUBLE) * 1000000.0, 0) " +
              "AS BIGINT)").as("w75_micro"),
            expr("CAST(round(CAST(w9 AS DOUBLE) / CAST(tw AS DOUBLE) " +
              "* 1000000.0, 0) AS BIGINT)").as("p_micro"))
          .orderBy($"n".desc, $"tok")
          .limit(20)
      },
      Some(s"""WITH cnt AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(round(sqrt(CAST(COUNT(*) AS DOUBLE) *
        |      sqrt(CAST(COUNT(*) AS DOUBLE))), 9) AS DECIMAL(28,9))
        |      AS w9
        |  FROM (SELECT unnest(${sqlTokens("text")}) AS tok
        |        FROM documents)
        |  GROUP BY tok),
        |tot AS (SELECT SUM(w9) AS tw FROM cnt)
        |SELECT tok, n,
        |  CAST(round(CAST(w9 AS DOUBLE) * 1000000.0, 0) AS BIGINT)
        |    AS w75_micro,
        |  CAST(round(CAST(w9 AS DOUBLE) / CAST(tw AS DOUBLE)
        |    * 1000000.0, 0) AS BIGINT) AS p_micro
        |FROM cnt, tot ORDER BY n DESC, tok LIMIT 20""".stripMargin),
      "unigram^(3/4) negative-sampling table (word2vec smoothing, " +
        "sqrt-composed power, exact decimal normalizer)"),

    // X4 bigram-LM cross-entropy: train an add-1-smoothed bigram language
    // model on the corpus itself and score each document by average
    // negative log p(w2|w1) — the CCNet/Gopher perplexity-filter shape one
    // order up from q_unigram_surprise (context-sensitive, so boilerplate
    // with common words in odd orders scores worse). Shapes at scale: the
    // LM is a (w1,w2)-keyed partial-agg count, context totals a w1-keyed
    // rollup of the LM (never a second corpus scan), and scoring joins the
    // doc bigrams back on (w1,w2) — ordinary keyed shuffles, linear in
    // corpus size; nothing is collected. Exactness: per-bigram log-prob is
    // 9-dp-rounded to DECIMAL before the doc sum (the q_unigram_surprise
    // recipe), so aggregation order cannot change the hash.
    "q_bigram_lm" -> GQuery(
      (s, d) => {
        import s.implicits._
        val toks = docs(s, d).select($"doc_id", tokens($"text").as("toks"))
        // bg feeds the LM count AND the scoring join-back. r15
        // materialized it; r16 re-adjudicated at the driver's local[32]
        // config and the LAZY form wins (isolated min-of-5: 1.11 vs
        // 1.22 s) — the two explode copies parallelize inside one job,
        // the checkpoint pays a barrier + copy (a shared (w1,w2)
        // repartition ties, 1.10 s, for a deeper plan). Vocab keeps its
        // own tokenize pass: it must see 1-token docs with no bigram
        val bg = toks.filter(size($"toks") >= 2)
          .select($"doc_id", explode(expr(
            "transform(sequence(1, size(toks)-1), " +
              "i -> struct(element_at(toks, i) AS w1, element_at(toks, i+1) AS w2))"))
            .as("bg"))
          .select($"doc_id", $"bg.w1", $"bg.w2")
        val lm = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("n_ab"))
        val ctx = lm.groupBy($"w1").agg(sum($"n_ab").as("n_a"))
        val vocab = toks.select(explode($"toks").as("tok"))
          .agg(countDistinct($"tok").as("v"))
        val scored = lm.join(ctx, "w1").crossJoin(broadcast(vocab))
          .select($"w1", $"w2",
            round(log(($"n_ab" + 1).cast("double") /
              ($"n_a" + $"v").cast("double")), 9)
              .cast("decimal(18,9)").as("sc"))
        bg.join(scored, Seq("w1", "w2"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum($"sc").as("ssum"))
          .select($"doc_id", $"n_bigrams",
            round(-($"ssum".cast("double")) / $"n_bigrams".cast("double"), 6)
              .as("cross_entropy"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH toks AS (
        |  SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents),
        |bg AS (
        |  SELECT doc_id, toks[CAST(i AS INT)] AS w1,
        |         toks[CAST(i AS INT)+1] AS w2
        |  FROM toks, unnest(generate_series(1, len(toks)-1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |lm AS (SELECT w1, w2, COUNT(*) AS n_ab FROM bg GROUP BY 1, 2),
        |ctx AS (SELECT w1, SUM(n_ab) AS n_a FROM lm GROUP BY w1),
        |vocab AS (
        |  SELECT COUNT(DISTINCT tok) AS v
        |  FROM (SELECT unnest(toks) AS tok FROM toks)),
        |sc AS (
        |  SELECT w1, w2,
        |    CAST(round(ln(CAST(n_ab + 1 AS DOUBLE) /
        |      CAST(n_a + v AS DOUBLE)), 9) AS DECIMAL(18,9)) AS sc
        |  FROM lm JOIN ctx USING (w1), vocab)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  round(-(CAST(SUM(sc) AS DOUBLE)) / CAST(COUNT(*) AS DOUBLE), 6)
        |    AS cross_entropy
        |FROM bg JOIN sc USING (w1, w2)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "add-1 bigram-LM cross-entropy per document (extension X4)"),

    // X4 Heaps'-law fit: vocabulary V grows as K·N^β with corpus size N —
    // the companion power law to q_zipf_slope, and the capacity-planning
    // number for vocabulary-bounded structures (BPE vocab, hash dicts,
    // embedding tables): β tells you how the distinct-token universe
    // scales to 100 TB before you pay for the scan. Points are the
    // per-source (ln N, ln V) pairs; the OLS fold is the q_zipf_slope
    // recipe exactly (decimal-exact sums of 9-dp logs, one IEEE solve).
    "q_heaps" -> GQuery(
      (s, d) => {
        import s.implicits._
        val e = docs(s, d)
          .select($"source", explode(tokens($"text")).as("tok"))
        val pts = e.groupBy($"source")
          .agg(count(lit(1)).as("n_toks"),
            countDistinct($"tok").as("vocab"))
          .select(
            round(log($"n_toks".cast("double")), 9)
              .cast("decimal(12,9)").as("x"),
            round(log($"vocab".cast("double")), 9)
              .cast("decimal(12,9)").as("y"))
        pts.agg(
            count(lit(1)).as("k"),
            sum($"x").cast("double").as("sx"),
            sum($"y").cast("double").as("sy"),
            sum($"x" * $"x").cast("double").as("sxx"),
            sum($"x" * $"y").cast("double").as("sxy"))
          .select($"k",
            round(($"k" * $"sxy" - $"sx" * $"sy") /
              ($"k" * $"sxx" - $"sx" * $"sx"), 6).as("heaps_beta"),
            round(exp(($"sy" - ($"k" * $"sxy" - $"sx" * $"sy") /
              ($"k" * $"sxx" - $"sx" * $"sx") * $"sx") / $"k"), 6)
              .as("heaps_k"))
      },
      Some(s"""WITH e AS (
        |  SELECT source, unnest(${sqlTokens("text")}) AS tok FROM documents),
        |st AS (
        |  SELECT source, COUNT(*) AS n_toks, COUNT(DISTINCT tok) AS vocab
        |  FROM e GROUP BY source),
        |r AS (
        |  SELECT
        |    CAST(round(ln(CAST(n_toks AS DOUBLE)), 9) AS DECIMAL(12,9)) AS x,
        |    CAST(round(ln(CAST(vocab AS DOUBLE)), 9) AS DECIMAL(12,9)) AS y
        |  FROM st),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(x*x) AS DOUBLE) AS sxx, CAST(SUM(x*y) AS DOUBLE) AS sxy
        |  FROM r)
        |SELECT k,
        |  round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS heaps_beta,
        |  round(exp((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx)
        |    / k), 6) AS heaps_k
        |FROM s""".stripMargin),
      "Heaps'-law vocabulary-growth fit over per-source points (X4)"),

    // X4 tokenizer fertility: BPE-ish tokens per whitespace word, by
    // language — the first number a tokenizer eval reports (a tokenizer
    // trained on English typically fragments other languages into more
    // pieces; fertility quantifies the compute tax per language before
    // committing a vocab). One scan, per-row regexp counts (codegen'd,
    // no explode), one lang-keyed partial-agg shuffle.
    "q_token_fertility" -> GQuery(
      (s, d) => {
        import s.implicits._
        docs(s, d)
          .select($"lang",
            size(tokens($"text")).cast("long").as("w"),
            size(regexp_extract_all($"text", lit(bpeRe), lit(0)))
              .cast("long").as("t"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum($"w").as("n_words"), sum($"t").as("n_bpe_tokens"))
          .select($"lang", $"n_docs", $"n_words", $"n_bpe_tokens",
            round($"n_bpe_tokens".cast("double") / $"n_words", 6)
              .as("fertility"))
          .orderBy($"lang")
      },
      Some(s"""SELECT lang,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(${sqlTokens("text")})) AS BIGINT) AS n_words,
        |  CAST(SUM(len(regexp_extract_all(text, '$bpeRe'))) AS BIGINT)
        |    AS n_bpe_tokens,
        |  round(CAST(SUM(len(regexp_extract_all(text, '$bpeRe'))) AS DOUBLE)
        |    / SUM(len(${sqlTokens("text")})), 6) AS fertility
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
      "BPE-tokens-per-word fertility by language (tokenizer eval, X4)"),

    // X4 train→test shingle coverage: the share of each source's
    // held-out-split 3-gram shingles already seen in the train split —
    // high coverage means the test split measures memorization, not
    // generalization (the soft-contamination counterpart to
    // q_contamination's exact 8-gram hits). Split = the q_split md5
    // bucket recipe (deterministic cross-engine). Shapes: one distinct
    // over (split, shingle-ish) rows, then a shingle-keyed LEFT join of
    // test shingles against the distinct train vocabulary — linear keyed
    // shuffles; at 100 TB the train vocabulary is itself huge, so the
    // join stays a plain shuffle join (never broadcast).
    "q_ngram_coverage" -> GQuery(
      (s, d) => {
        import s.implicits._
        val bucket = pmod(conv(substring(md5($"doc_id".cast("string")), 1, 8),
          16, 10).cast("bigint"), lit(100))
        val sh = docs(s, d)
          .withColumn("toks", tokens($"text"))
          .filter(size($"toks") >= 3)
          .withColumn("split",
            when(bucket < 80, "train").otherwise("heldout"))
          .select($"source", $"split", explode(expr(
            "transform(sequence(1, size(toks)-2), i -> concat_ws(' ', slice(toks, i, 3)))"))
            .as("sh"))
        val train = sh.filter($"split" === "train")
          .select($"sh").distinct().withColumn("seen", lit(1))
        sh.filter($"split" === "heldout")
          .select($"source", $"sh").distinct()
          .join(train, Seq("sh"), "left")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_shingles"),
            sum(coalesce($"seen", lit(0))).cast("bigint").as("n_covered"))
          .select($"source", $"n_shingles", $"n_covered",
            round($"n_covered".cast("double") / $"n_shingles", 6)
              .as("coverage"))
          .orderBy($"source")
      },
      Some(s"""WITH t AS (
        |  SELECT doc_id, source,
        |    CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 100 < 80 THEN 'train' ELSE 'heldout' END AS split,
        |    ${sqlTokens("text")} AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT source, split,
        |    unnest(list_transform(generate_series(1, len(toks)-2),
        |      i -> array_to_string(toks[i:i+2], ' '))) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |train AS (SELECT DISTINCT sh FROM sh WHERE split = 'train'),
        |held AS (
        |  SELECT DISTINCT source, sh FROM sh WHERE split = 'heldout')
        |SELECT h.source,
        |  CAST(COUNT(*) AS BIGINT) AS n_shingles,
        |  CAST(SUM(CASE WHEN tr.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_covered,
        |  round(CAST(SUM(CASE WHEN tr.sh IS NOT NULL THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*), 6) AS coverage
        |FROM held h LEFT JOIN train tr ON h.sh = tr.sh
        |GROUP BY h.source ORDER BY h.source""".stripMargin),
      "train→heldout shingle coverage per source (generalization audit, X4)"),

    // X4 domain shift: KL divergence of each source's word distribution
    // against the whole corpus — the mixing-diagnostics counterpart to
    // q_mix_temperature (which reweights sources; this measures how far
    // each source's language actually is from the blend). Shapes: one
    // (source, tok) partial-count shuffle; corpus counts and totals are
    // broadcast dims. Same 9-dp-log + decimal-sum exactness recipe.
    "q_kl_sources" -> GQuery(
      (s, d) => {
        import s.implicits._
        val e = docs(s, d)
          .select($"source", explode(tokens($"text")).as("tok"))
        val sw = e.groupBy($"source", $"tok").agg(count(lit(1)).as("c_sw"))
        val st = sw.groupBy($"source").agg(sum($"c_sw").as("t_s"))
        val cw = e.groupBy($"tok").agg(count(lit(1)).as("c_w"))
        val tot = cw.agg(sum($"c_w").as("t"))
        val p = $"c_sw".cast("double") / $"t_s".cast("double")
        val q = $"c_w".cast("double") / $"t".cast("double")
        sw.join(st, "source").join(broadcast(cw), "tok")
          .crossJoin(broadcast(tot))
          .select($"source", $"t_s",
            round(p * round(log(p / q), 9), 12)
              .cast("decimal(28,12)").as("term"))
          .groupBy($"source", $"t_s")
          .agg(sum($"term").as("klsum"))
          .select($"source", $"t_s".as("n_words"),
            round($"klsum".cast("double"), 6).as("kl"))
          .orderBy($"source")
      },
      Some(s"""WITH e AS (
        |  SELECT source, unnest(${sqlTokens("text")}) AS tok FROM documents),
        |sw AS (SELECT source, tok, COUNT(*) AS c_sw FROM e GROUP BY 1, 2),
        |st AS (SELECT source, SUM(c_sw) AS t_s FROM sw GROUP BY source),
        |cw AS (SELECT tok, COUNT(*) AS c_w FROM e GROUP BY tok),
        |tot AS (SELECT SUM(c_w) AS t FROM cw),
        |terms AS (
        |  SELECT sw.source, st.t_s,
        |    CAST(round(
        |      (CAST(c_sw AS DOUBLE) / CAST(t_s AS DOUBLE)) *
        |      round(ln((CAST(c_sw AS DOUBLE) / CAST(t_s AS DOUBLE)) /
        |                (CAST(c_w AS DOUBLE) / CAST(t AS DOUBLE))), 9),
        |      12) AS DECIMAL(28,12)) AS term
        |  FROM sw JOIN st USING (source) JOIN cw USING (tok), tot)
        |SELECT source, CAST(t_s AS BIGINT) AS n_words,
        |  round(CAST(SUM(term) AS DOUBLE), 6) AS kl
        |FROM terms GROUP BY source, t_s ORDER BY source""".stripMargin),
      "per-source KL divergence vs corpus word distribution (extension X4)"),

    // X4 repetition quality gate (the Gopher/RedPajama repetition rules,
    // word-n-gram form): machine-generated and boilerplate text repeats
    // itself, so per-document we score (a) the most frequent bigram's
    // share of all bigrams, (b) the duplicate-bigram fraction, (c) the
    // duplicate-trigram fraction, and gate on (a) and (c). Two explode +
    // partial-agg passes, all exact counts; ratios are single IEEE
    // divisions rounded to 6 dp (the established recipe) and the keep
    // verdict compares the ROUNDED ratios identically on both engines.
    // Thresholds sit at the observed p90-p99 knee so both verdicts occur
    // at every SF (planted near-dup docs trip the trigram rule).
    "q_repetition_gate" -> GQuery(
      (s, d) => {
        import s.implicits._
        // spread: two n-gram explodes off one narrow scan; counts are
        // integer so the guard is value-neutral
        val t = spread(docs(s, d))
          .select($"doc_id", tokens($"text").as("toks"))
          .filter(size($"toks") >= 3)
        def grams(k: Int) = t.select($"doc_id", explode(expr(
          s"transform(sequence(1, size(toks)-${k - 1}), i -> concat_ws(' ', slice(toks, i, $k)))"))
          .as("g"))
          .groupBy($"doc_id", $"g").agg(count(lit(1)).as("n"))
        val s2 = grams(2).groupBy($"doc_id").agg(
          max($"n").as("top2"), sum($"n").as("tot2"),
          count(lit(1)).as("dist2"))
        val s3 = grams(3).groupBy($"doc_id").agg(
          sum($"n").as("tot3"), count(lit(1)).as("dist3"))
        s2.join(s3, "doc_id")
          .select($"doc_id",
            round($"top2".cast("double") / $"tot2".cast("double"), 6)
              .as("top_bigram_frac"),
            round(lit(1.0) - $"dist2".cast("double") / $"tot2".cast("double"), 6)
              .as("dup_bigram_frac"),
            round(lit(1.0) - $"dist3".cast("double") / $"tot3".cast("double"), 6)
              .as("dup_trigram_frac"))
          .withColumn("keep",
            $"top_bigram_frac" <= 0.08 && $"dup_trigram_frac" <= 0.02)
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (
        |  SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents),
        |g2 AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)-1),
        |    i -> toks[i] || ' ' || toks[i+1])) AS g
        |  FROM t WHERE len(toks) >= 3),
        |c2 AS (SELECT doc_id, g, COUNT(*) AS n FROM g2 GROUP BY 1, 2),
        |s2 AS (SELECT doc_id,
        |    round(CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6)
        |      AS top_bigram_frac,
        |    round(1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6)
        |      AS dup_bigram_frac
        |  FROM c2 GROUP BY doc_id),
        |g3 AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)-2),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g
        |  FROM t WHERE len(toks) >= 3),
        |c3 AS (SELECT doc_id, g, COUNT(*) AS n FROM g3 GROUP BY 1, 2),
        |s3 AS (SELECT doc_id,
        |    round(1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6)
        |      AS dup_trigram_frac
        |  FROM c3 GROUP BY doc_id)
        |SELECT doc_id, top_bigram_frac, dup_bigram_frac, dup_trigram_frac,
        |  (top_bigram_frac <= 0.08 AND dup_trigram_frac <= 0.02) AS keep
        |FROM s2 JOIN s3 USING (doc_id) ORDER BY doc_id""".stripMargin),
      "word-n-gram repetition quality gate (extension X4)"),

    // X4 linear quality-classifier SERVING (the fasttext/CCNet-style
    // quality filter every LLM corpus pipeline runs): tokens hash into 64
    // feature buckets, a broadcast weight table scores each token, and the
    // per-doc mean weight is the quality logit. The WEIGHTS here are
    // deterministic stand-ins (md5-derived per bucket — production swaps
    // in trained values; the distributed serving path is what's built):
    // integer micro-unit weights summed exactly, ONE division at the end,
    // no exp/sigmoid anywhere — the logit threshold decides keep, so the
    // whole score is cross-engine exact. Scale shape: explode + broadcast
    // join against 64 rows + one doc-keyed partial-agg shuffle.
    "q_quality_classifier" -> GQuery(
      (s, d) => {
        import s.implicits._
        // bucket b's weight: md5-derived int in [0, 1e6) micro units (the
        // q_sample_hash integer recipe). Kept NON-NEGATIVE so the mean
        // below is an exact truncating integer division with identical
        // semantics on both engines — rounding a double quotient at 6 dp
        // is NOT cross-engine stable when the true value has unbounded
        // decimals (observed one-ulp hash breaks at sf0.001/0.1).
        val weights = s.range(0, 64).toDF("bucket")
          .select($"bucket",
            pmod(conv(substring(md5(concat(lit("w"),
              $"bucket".cast("string"))), 1, 8), 16, 10).cast("long"),
              lit(1000000L)).as("w_micro"))
        val toks = docs(s, d)
          .select($"doc_id", explode(tokens($"text")).as("tok"))
          .withColumn("bucket",
            pmod(conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long"),
              lit(64L)))
        toks.join(broadcast(weights), "bucket")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum($"w_micro").as("wsum"))
          // exact mean micro-weight; /1e6 then round(6) is safe ONLY
          // because mean_micro/1e6 is exactly 6 decimal places
          .select($"doc_id", $"n_tokens",
            expr("wsum DIV n_tokens").as("mean_micro"))
          .select($"doc_id", $"n_tokens",
            round($"mean_micro".cast("double") / 1e6, 6)
              .as("quality_score"),
            ($"mean_micro" >= 450000L).as("keep"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH w AS (
        |  SELECT b.bucket,
        |    ('0x' || substring(md5('w' || CAST(b.bucket AS VARCHAR)), 1, 8))::BIGINT
        |      % 1000000 AS w_micro
        |  FROM (SELECT unnest(generate_series(0, 63)) AS bucket) b),
        |tk AS (
        |  SELECT doc_id, unnest(${sqlTokens("text")}) AS tok FROM documents),
        |tb AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5(tok), 1, 8))::BIGINT % 64 AS bucket
        |  FROM tk),
        |sc AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |    CAST(SUM(w_micro) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
        |      AS mean_micro
        |  FROM tb JOIN w USING (bucket) GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |  round(CAST(mean_micro AS DOUBLE) / 1e6, 6) AS quality_score,
        |  mean_micro >= 450000 AS keep
        |FROM sc ORDER BY doc_id""".stripMargin),
      "hashed linear quality-classifier scoring (extension X4)"),

    // X4 character-distribution Shannon entropy — the classic cheap
    // gibberish/encoding-garbage detector (low entropy = repeated filler,
    // high entropy = random bytes; prose sits in a narrow band). Reported
    // in NATS via the count-form identity H = ln(tot) − (Σ cnt·ln cnt)/tot
    // so every transcendental takes an INTEGER argument: ln of an integer
    // rounded to 9 dp is the repo's proven cross-engine recipe
    // (q_zipf_slope), whereas ln/log2 of per-doc RATIOS hits 6-dp rounding
    // boundaries between Spark's StrictMath and DuckDB's libm at sf0.1
    // (observed: one row in 5000). cnt·round9(ln cnt) stays exact in
    // DECIMAL; only the final subtraction runs in double. Per-doc char
    // histogram is a (doc_id, ch)-keyed partial-agg shuffle, the doc total
    // reuses the same doc_id partitioning — all shuffles key-partitioned,
    // nothing all-pairs or single-partition, so the shape holds at 100 TB.
    "q_char_entropy" -> GQuery(
      (s, d) => {
        import s.implicits._
        val chars = Tables.load(s, d, "documents")
          .filter(length($"text") >= 1)
          // split on the empty pattern is the single-pass char explode
          // (one scan per doc); the transform/substring(i,1) formulation
          // it replaced rescans the string prefix per position (O(len²)
          // per doc — measurable at corpus scale). Verified equal
          // element-for-element on the corpus before the swap.
          .select($"doc_id", explode(split($"text", "")).as("ch"))
        chars.groupBy($"doc_id", $"ch")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("term",
            ($"cnt".cast("decimal(18,0)") *
              round(log($"cnt".cast("double")), 9).cast("decimal(12,9)"))
              .cast("decimal(28,9)"))
          .groupBy($"doc_id")
          .agg(sum($"cnt").as("n_chars_counted"),
            count(lit(1)).as("n_uniq_chars"),
            sum($"term").as("s"))
          .withColumn("char_entropy_nats",
            round(round(log($"n_chars_counted".cast("double")), 9)
              - $"s".cast("double") / $"n_chars_counted".cast("double"), 6))
          .select($"doc_id", $"n_chars_counted", $"n_uniq_chars",
            $"char_entropy_nats")
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
        |  SELECT doc_id, text FROM documents WHERE length(text) >= 1),
        |ch AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, length(text)),
        |      i -> substring(text, i, 1))) AS ch
        |  FROM t),
        |c AS (
        |  SELECT doc_id, ch, COUNT(*) AS cnt FROM ch GROUP BY doc_id, ch),
        |a AS (
        |  SELECT doc_id,
        |    CAST(SUM(cnt) AS BIGINT) AS n_chars_counted,
        |    CAST(COUNT(*) AS BIGINT) AS n_uniq_chars,
        |    SUM(CAST(cnt AS DECIMAL(18,0))
        |      * CAST(round(ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(12,9)))
        |      AS s
        |  FROM c GROUP BY doc_id)
        |SELECT doc_id, n_chars_counted, n_uniq_chars,
        |  round(CAST(round(ln(CAST(n_chars_counted AS DOUBLE)), 9) AS DOUBLE)
        |    - CAST(s AS DOUBLE) / CAST(n_chars_counted AS DOUBLE), 6)
        |    AS char_entropy_nats
        |FROM a ORDER BY doc_id""".stripMargin),
      "per-document character Shannon entropy quality signal (extension X4)"),

    // X4 Unicode NFC normalization via the native codegen expression
    // (functions/UnicodeNormalizeExpr.scala) — text-pipeline step zero:
    // decomposed and composed accents must fingerprint identically before
    // any dedup. The synthetic corpus is ASCII (normalization-neutral),
    // so the query prepends a DECOMPOSED "cafe"+U+0301 prefix to every
    // row, making the normalizer do real work on every document: the
    // code-point length must drop by exactly one and the md5 of the
    // normalized text must match DuckDB's utf8proc-based nfc_normalize
    // byte-for-byte — two independent Unicode implementations agreeing
    // on content, not just counts. Per-row projection, zero shuffles.
    "q_nfc_normalize" -> GQuery(
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "documents")
          .withColumn("raw", concat(lit("cafe\u0301 "), $"text"))
          .withColumn("nfc", expr("unicode_norm(raw, 'NFC')"))
          .select($"doc_id",
            length($"raw").as("len_raw"),
            length($"nfc").as("len_nfc"),
            substring(md5($"nfc"), 1, 8).as("nfc_fp"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (
        |  SELECT doc_id,
        |    'caf' || chr(101) || chr(769) || ' ' || text AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(raw) AS INT) AS len_raw,
        |  CAST(length(nfc_normalize(raw)) AS INT) AS len_nfc,
        |  substring(md5(nfc_normalize(raw)), 1, 8) AS nfc_fp
        |FROM t ORDER BY doc_id""".stripMargin),
      "native NFC normalization pinned against DuckDB utf8proc (X4)"),

    // X4/X3 BM25 lexical retrieval — the sparse leg of hybrid search
    // (q_rrf_fusion fuses dense cosine + PQ; BM25 is the inverted-index
    // counterpart every retrieval stack pairs with them). Okapi scoring
    // with k1=1.2, b=0.75 and the plain ln(N/df) idf (the q_tfidf form —
    // integer-argument logs stay inside the 10-sig-fig cross-engine
    // envelope; the ±0.5-smoothed idf variant would put a rational inside
    // the ln). Per-term scores are 9-dp-rounded then summed as
    // DECIMAL(18,9) so the ≤4-term per-doc sum cannot drift with
    // aggregation order. Scale shape: the probe filter prunes the explode
    // to query terms only (at scale: an inverted-index scan, not a corpus
    // scan), df and corpus stats are broadcast one-row joins, and the
    // final top-k is TakeOrdered — no global sort, no all-pairs.
    "q_bm25" -> GQuery(
      (s, d) => {
        import s.implicits._
        val probe = Seq("spark", "table", "join", "query")
        val dd = docs(s, d)
          .select($"doc_id", graft.Fns.tokens($"text").as("toks"))
          .select($"doc_id", size($"toks").as("dl"), $"toks")
        val stats = dd.agg(count(lit(1)).as("n_docs"),
          sum($"dl").as("tot_tokens"))
        val tf = dd.select($"doc_id", $"dl", explode($"toks").as("tok"))
          .filter($"tok".isin(probe: _*))
          .groupBy($"doc_id", $"dl", $"tok").agg(count(lit(1)).as("c"))
        val dfreq = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
        tf.join(broadcast(dfreq), "tok")
          .crossJoin(broadcast(stats))
          .withColumn("avgdl",
            $"tot_tokens".cast("double") / $"n_docs".cast("double"))
          .withColumn("term_score", round(
            log($"n_docs".cast("double") / $"df".cast("double")) *
              ($"c".cast("double") * lit(2.2)) /
              ($"c".cast("double") + lit(1.2) *
                (lit(0.25) + lit(0.75) * $"dl".cast("double") / $"avgdl")),
            9).cast("decimal(18,9)"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_terms"),
            round(sum($"term_score").cast("double"), 6).as("bm25"))
          .orderBy($"bm25".desc, $"doc_id")
          .limit(20)
      },
      Some(s"""WITH dd AS (
        |  SELECT doc_id, ${sqlTokens("text")} AS toks,
        |    len(${sqlTokens("text")}) AS dl
        |  FROM documents),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |              CAST(SUM(dl) AS BIGINT) AS tot_tokens FROM dd),
        |tf AS (
        |  SELECT doc_id, dl, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM dd)
        |  WHERE tok IN ('spark', 'table', 'join', 'query')
        |  GROUP BY 1, 2, 3),
        |dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
        |        FROM tf GROUP BY 1),
        |ts AS (
        |  SELECT tf.doc_id,
        |    CAST(round(
        |      ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) *
        |        (CAST(c AS DOUBLE) * 2.2) /
        |        (CAST(c AS DOUBLE) + 1.2 *
        |          (0.25 + 0.75 * CAST(dl AS DOUBLE) /
        |            (CAST(tot_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)))),
        |      9) AS DECIMAL(18,9)) AS term_score
        |  FROM tf JOIN dfq USING (tok), st)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
        |  round(CAST(SUM(term_score) AS DOUBLE), 6) AS bm25
        |FROM ts GROUP BY doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin),
      "Okapi BM25 lexical retrieval top-k (sparse leg of hybrid search)"),

    // X4 classifier calibration / reliability curve: bin the hashed
    // linear classifier's exact integer logit (q_quality_classifier's
    // mean_micro) into FIXED 0.05-wide score bands and report each band's
    // population, exact mean score, and observed 'en' rate — the
    // reliability diagram that decides whether a quality filter's scores
    // can be thresholded or must be recalibrated. Fixed bins rather than
    // ntile deciles on purpose: decile assignment needs a global sort
    // (single-partition window) while fixed bands are embarrassingly
    // parallel — the same scale decision q_histogram made vs
    // q_histogram_eqd. All band math is exact integer (DIV), the two
    // ratios are one rounded double division each.
    "q_calibration" -> GQuery(
      (s, d) => {
        import s.implicits._
        val weights = s.range(0, 64).toDF("bucket")
          .select($"bucket",
            pmod(conv(substring(md5(concat(lit("w"),
              $"bucket".cast("string"))), 1, 8), 16, 10).cast("long"),
              lit(1000000L)).as("w_micro"))
        val toks = docs(s, d)
          .select($"doc_id", $"lang", explode(tokens($"text")).as("tok"))
          .withColumn("bucket",
            pmod(conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long"),
              lit(64L)))
        toks.join(broadcast(weights), "bucket")
          .groupBy($"doc_id", $"lang")
          .agg(count(lit(1)).as("n_tokens"), sum($"w_micro").as("wsum"))
          .select($"lang", expr("wsum DIV n_tokens").as("mean_micro"))
          .groupBy(expr("mean_micro DIV 50000").as("bin"))
          .agg(count(lit(1)).as("n_docs"),
            round((expr("sum(mean_micro) DIV count(1)")).cast("double")
              / 1e6, 6).as("mean_score"),
            round(sum(when($"lang" === "en", 1L).otherwise(0L))
              .cast("double") / count(lit(1)).cast("double"), 6)
              .as("en_rate"))
          .orderBy($"bin")
      },
      Some(s"""WITH w AS (
        |  SELECT b.bucket,
        |    ('0x' || substring(md5('w' || CAST(b.bucket AS VARCHAR)), 1, 8))::BIGINT
        |      % 1000000 AS w_micro
        |  FROM (SELECT unnest(generate_series(0, 63)) AS bucket) b),
        |tb AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substring(md5(tok), 1, 8))::BIGINT % 64 AS bucket
        |  FROM (SELECT doc_id, lang, unnest(${sqlTokens("text")}) AS tok
        |        FROM documents)),
        |sc AS (
        |  SELECT doc_id, lang,
        |    CAST(SUM(w_micro) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
        |      AS mean_micro
        |  FROM tb JOIN w USING (bucket) GROUP BY doc_id, lang)
        |SELECT mean_micro // 50000 AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  round(CAST(CAST(SUM(mean_micro) AS BIGINT)
        |    // CAST(COUNT(*) AS BIGINT) AS DOUBLE) / 1e6, 6) AS mean_score,
        |  round(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS en_rate
        |FROM sc GROUP BY 1 ORDER BY bin""".stripMargin),
      "fixed-bin reliability curve for the hashed quality classifier"),

    // X4 Jensen-Shannon divergence between the en and non-en token
    // distributions — the bounded, symmetric corpus-drift metric KL
    // (q_kl_sources) can't give: JSD(P,Q) = ½·KL(P||M) + ½·KL(Q||M) with
    // M = (P+Q)/2, in bits ∈ [0, 1]. Zero-count tokens contribute 0 from
    // their side (no smoothing needed). One token-keyed partial-agg
    // shuffle + a full outer join of the two count tables; the two totals
    // ride in as broadcast one-row scalars. Per-token terms follow the
    // exactness recipe: round 9 dp → DECIMAL sum → final 6-dp round.
    "q_jsd" -> GQuery(
      (s, d) => {
        import s.implicits._
        val e = docs(s, d).select(
          when($"lang" === "en", lit("p")).otherwise(lit("q")).as("side"),
          explode(tokens($"text")).as("tok"))
        // one vocab-grain PIVOT (conditional sums == the old p/q
        // full-outer join: sum over zero rows is NULL exactly where the
        // join left a null side), checkpointed for its two consumers
        // (mass anchor + term pass) so the corpus explode runs once —
        // and tp/tq fold into ONE 1-row reduction (r13 audit:
        // singlepart x3 from pt/qt + the duplicated explode)
        val piv = e.groupBy($"side", $"tok").agg(count(lit(1)).as("n"))
          .groupBy($"tok")
          .agg(sum(when($"side" === "p", $"n")).as("np"),
            sum(when($"side" === "q", $"n")).as("nq"))
          .localCheckpoint()
        val tots = piv.agg(sum($"np").as("tp"), sum($"nq").as("tq"))
        val joined = piv
          .crossJoin(broadcast(tots))
          .select(
            (coalesce($"np", lit(0L)).cast("double") / $"tp").as("pp"),
            (coalesce($"nq", lit(0L)).cast("double") / $"tq").as("qq"))
        joined
          .select(
            (when($"pp" > 0,
              lit(0.5) * $"pp" * log2($"pp" / (($"pp" + $"qq") / 2)))
              .otherwise(lit(0.0)) +
              when($"qq" > 0,
                lit(0.5) * $"qq" * log2($"qq" / (($"pp" + $"qq") / 2)))
                .otherwise(lit(0.0))).as("raw"))
          .select(round($"raw", 9).cast("decimal(20,9)").as("term"))
          .agg(count(lit(1)).as("n_tokens"), sum($"term").as("tsum"))
          .select($"n_tokens",
            round($"tsum".cast("double"), 6).as("jsd_bits"))
      },
      Some(s"""WITH tok AS (
        |  SELECT CASE WHEN lang='en' THEN 'p' ELSE 'q' END AS side,
        |    unnest(${sqlTokens("text")}) AS tok
        |  FROM documents),
        |cnt AS (SELECT side, tok, CAST(COUNT(*) AS BIGINT) AS n
        |        FROM tok GROUP BY 1, 2),
        |pt AS (SELECT CAST(SUM(n) AS BIGINT) AS tp FROM cnt WHERE side='p'),
        |qt AS (SELECT CAST(SUM(n) AS BIGINT) AS tq FROM cnt WHERE side='q'),
        |j AS (
        |  SELECT
        |    CAST(COALESCE(p.n, 0) AS DOUBLE) / tp AS pp,
        |    CAST(COALESCE(q.n, 0) AS DOUBLE) / tq AS qq
        |  FROM (SELECT tok, n FROM cnt WHERE side='p') p
        |  FULL JOIN (SELECT tok, n FROM cnt WHERE side='q') q
        |    ON p.tok = q.tok, pt, qt),
        |terms AS (
        |  SELECT CAST(round(
        |      CASE WHEN pp>0 THEN 0.5*pp*log2(pp/((pp+qq)/2)) ELSE 0 END
        |    + CASE WHEN qq>0 THEN 0.5*qq*log2(qq/((pp+qq)/2)) ELSE 0 END,
        |    9) AS DECIMAL(20,9)) AS term
        |  FROM j)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  round(CAST(SUM(term) AS DOUBLE), 6) AS jsd_bits
        |FROM terms""".stripMargin),
      "Jensen-Shannon divergence (bits) between en and non-en token mass"),

    // X4 Count-Min sketch: the point-frequency companion to the HLL /
    // theta cardinality sketches — d=4 hash rows × w=256 counters, so the
    // whole sketch is ≤1024 longs built from map-side partials regardless
    // of corpus size, and any token's frequency is over-estimated by at
    // most the bucket collisions (est ≥ exact ALWAYS; E[err] ≤ N/w).
    // Unlike sampling sketches, CM is fully DETERMINISTIC given the hash
    // family (the md5 recipe both engines share), so the oracle checks
    // the estimates exactly — and the overcount column self-documents the
    // sketch error against the exact counts. At 100 TB: the counter
    // build is one partial-agg shuffle of ≤1024 rows; estimates are a
    // broadcast join against the sketch.
    "q_countmin" -> GQuery(
      (s, d) => {
        import s.implicits._
        val cnt = docs(s, d)
          .select(explode(tokens($"text")).as("tok"))
          .groupBy($"tok").agg(count(lit(1)).as("exact"))
        val hashRows = s.range(0, 4).select($"id".cast("int").as("i"))
        def bucket(tok: org.apache.spark.sql.Column,
            i: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          conv(substring(md5(concat(i.cast("string"), lit(":"), tok)),
            1, 8), 16, 10).cast("bigint") % 256
        val cm = cnt.crossJoin(broadcast(hashRows))
          .groupBy($"i", bucket($"tok", $"i").as("bucket"))
          .agg(sum($"exact").as("counter"))
        cnt.orderBy($"exact".desc, $"tok").limit(20)
          .crossJoin(broadcast(hashRows))
          .withColumn("bucket", bucket($"tok", $"i"))
          .join(broadcast(cm), Seq("i", "bucket"))
          .groupBy($"tok", $"exact")
          .agg(min($"counter").as("cm_est"))
          .select($"tok", $"exact", $"cm_est",
            ($"cm_est" - $"exact").as("overcount"))
          .orderBy($"exact".desc, $"tok")
      },
      Some(s"""WITH cnt AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact
        |  FROM (SELECT unnest(${sqlTokens("text")}) AS tok FROM documents)
        |  GROUP BY 1),
        |rows_ AS (SELECT unnest(generate_series(0, 3)) AS i),
        |cm AS (
        |  SELECT i,
        |    ('0x' || substring(md5(CAST(i AS VARCHAR) || ':' || tok), 1, 8))::BIGINT
        |      % 256 AS bucket,
        |    CAST(SUM(exact) AS BIGINT) AS counter
        |  FROM cnt, rows_ GROUP BY 1, 2),
        |top AS (SELECT tok, exact FROM cnt ORDER BY exact DESC, tok LIMIT 20)
        |SELECT t.tok, t.exact, CAST(MIN(cm.counter) AS BIGINT) AS cm_est,
        |  CAST(MIN(cm.counter) - t.exact AS BIGINT) AS overcount
        |FROM top t JOIN rows_ r ON true
        |JOIN cm ON cm.i = r.i AND cm.bucket =
        |  ('0x' || substring(md5(CAST(r.i AS VARCHAR) || ':' || t.tok), 1, 8))::BIGINT % 256
        |GROUP BY t.tok, t.exact ORDER BY t.exact DESC, t.tok""".stripMargin),
      "Count-Min sketch frequency estimates vs exact counts (d=4, w=256)"),

    // X1/X3 Bloom-filter membership — the join-pruning primitive at
    // 100 TB: before shipping a huge probe side across the wire, test
    // each key against a Bloom filter of the build side (k=3 md5-derived
    // positions, m = 8·n_built bits, so the load factor — and the FP
    // rate — is scale-invariant). Here the filter over src0's document
    // fingerprints screens the whole corpus; the exact membership join
    // runs alongside to measure the realized false-positive rate. The
    // filter is represented as its inverted set-bit table (≤ m rows,
    // broadcast): a probe is positive iff all 3 of its positions hit.
    // Deterministic hashing makes the whole audit oracle-EXACT; the
    // Bloom guarantee (member ⇒ all positions hit ⇒ zero false
    // negatives) is visible as exact_members ≤ bloom_positives per row.
    "q_bloom" -> GQuery(
      (s, d) => {
        import s.implicits._
        val base = docs(s, d)
          .select($"doc_id", $"lang", $"source", md5($"text").as("fp"))
        val sz = base.filter($"source" === "src0")
          .agg((count(lit(1)) * 8).cast("bigint").as("m"))
        val builtFp = base.filter($"source" === "src0")
          .select($"fp").distinct()
        val ks = s.range(0, 3).select($"id".cast("int").as("i"))
        def pos(fp: org.apache.spark.sql.Column,
            i: org.apache.spark.sql.Column,
            m: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          conv(substring(md5(concat(i.cast("string"), lit(":"), fp)),
            1, 8), 16, 10).cast("bigint") % m
        val builtPos = builtFp.crossJoin(broadcast(sz))
          .crossJoin(broadcast(ks))
          .select($"i", pos($"fp", $"i", $"m").as("p")).distinct()
          .withColumn("hit", lit(1))
        val probe = base.crossJoin(broadcast(sz)).crossJoin(broadcast(ks))
          .select($"doc_id", $"lang", $"fp", $"i",
            pos($"fp", $"i", $"m").as("p"))
          .join(broadcast(builtPos), Seq("i", "p"), "left")
          .groupBy($"doc_id", $"lang", $"fp")
          .agg(sum(coalesce($"hit", lit(0))).as("hits"))
        probe.join(broadcast(builtFp.withColumn("member", lit(1))),
            Seq("fp"), "left")
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce($"member", lit(0))).cast("bigint")
              .as("exact_members"),
            sum(when($"hits" === 3, 1L).otherwise(0L))
              .as("bloom_positives"),
            sum(when($"hits" === 3 && $"member".isNull, 1L).otherwise(0L))
              .as("false_positives"))
          .orderBy($"lang")
      },
      Some("""WITH base AS (
        |  SELECT doc_id, lang, source, md5(text) AS fp FROM documents),
        |sz AS (SELECT CAST(COUNT(*) * 8 AS BIGINT) AS m
        |       FROM base WHERE source = 'src0'),
        |bfp AS (SELECT DISTINCT fp FROM base WHERE source = 'src0'),
        |ks AS (SELECT unnest(generate_series(0, 2)) AS i),
        |bpos AS (
        |  SELECT DISTINCT i,
        |    ('0x' || substring(md5(CAST(i AS VARCHAR) || ':' || fp), 1, 8))::BIGINT
        |      % m AS p
        |  FROM bfp, sz, ks),
        |ppos AS (
        |  SELECT b.doc_id, b.lang, b.fp, k.i,
        |    ('0x' || substring(md5(CAST(k.i AS VARCHAR) || ':' || b.fp), 1, 8))::BIGINT
        |      % m AS p
        |  FROM base b, sz, ks k),
        |probe AS (
        |  SELECT doc_id, lang, fp,
        |    CAST(SUM(CASE WHEN bp.hit IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS hits
        |  FROM ppos LEFT JOIN (SELECT i, p, 1 AS hit FROM bpos) bp
        |    USING (i, p)
        |  GROUP BY 1, 2, 3)
        |SELECT p.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN e.member IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS exact_members,
        |  CAST(SUM(CASE WHEN p.hits = 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS bloom_positives,
        |  CAST(SUM(CASE WHEN p.hits = 3 AND e.member IS NULL THEN 1 ELSE 0
        |    END) AS BIGINT) AS false_positives
        |FROM probe p
        |LEFT JOIN (SELECT fp, 1 AS member FROM bfp) e USING (fp)
        |GROUP BY 1 ORDER BY 1""".stripMargin),
      "Bloom-filter membership screen vs exact join (k=3, m=8n, per lang)"),

    // X4 distributed batch-perceptron TRAINING for the language filter —
    // the missing half of the classifier family: q_quality_classifier /
    // q_calibration SERVE a hashed linear model; this trains one, and the
    // perceptron rule (w += Σ y·x over mistakes) needs no sigmoid or
    // learning rate, so the whole 2-round loop is INTEGER-exact and
    // oracle-replayable — the q_pagerank2 / q_kmeans_step recipe applied
    // to supervised learning. Features: 64 hashed token-bucket counts
    // (identical hashing to the serving path); label y = ±1 on lang='en'.
    // Round 1 from w=0 marks every doc a mistake (margin 0 ≤ 0), so
    // w1 = Σ_docs y·x; round 2 re-scores against w1 and updates on the
    // remaining mistakes. Scale shape: one token-explode partial-agg to
    // doc×bucket counts, model state is a 64-row BROADCAST each round
    // (never a shuffle), margins are one doc-keyed partial agg, updates
    // one bucket-keyed partial agg — linear in tokens per round, the
    // textbook distributed batch-perceptron layout.
    "q_perceptron" -> GQuery(
      (s, d) => {
        import s.implicits._
        // spread: token explode + md5 bucketing dominate; all downstream
        // aggregation is integer, so the guard cannot change values
        // r15: tb (the token explode + md5 battery + doc×bucket agg) is
        // consumed by w1, the margin pass AND the update pass — the lazy
        // plan rebuilt the whole CPU-bound battery three times per run.
        // One materialization (doc×64-bucket rows, the feature table a
        // production trainer stores anyway) feeds all three.
        val tb = spread(docs(s, d))
          .select($"doc_id",
            when($"lang" === "en", 1L).otherwise(-1L).as("y"),
            explode(tokens($"text")).as("tok"))
          .withColumn("bucket",
            pmod(conv(substring(md5($"tok"), 1, 8), 16, 10).cast("long"),
              lit(64L)))
          .groupBy($"doc_id", $"y", $"bucket")
          .agg(count(lit(1)).as("x"))
          .cut
        val w1 = tb.groupBy($"bucket")
          .agg(sum($"y" * $"x").as("w1"))
        // margins feeds both the mistake set and the stats anchor —
        // checkpointed (doc-keyed, tiny) so the model join runs once
        val margins = tb.join(broadcast(w1), "bucket")
          .groupBy($"doc_id", $"y")
          .agg(sum($"w1" * $"x").as("m0"))
          .cut
        val mistakes = margins.filter($"y" * $"m0" <= 0)
          .select($"doc_id")
        val upd = tb.join(mistakes, "doc_id")
          .groupBy($"bucket").agg(sum($"y" * $"x").as("dw"))
        val stats = margins.agg(count(lit(1)).as("n_train"),
          sum(when($"y" * $"m0" <= 0, 1L).otherwise(0L))
            .as("n_mistakes_r2"))
        w1.join(upd, Seq("bucket"), "left")
          .select($"bucket", $"w1",
            ($"w1" + coalesce($"dw", lit(0L))).as("w2"))
          .crossJoin(broadcast(stats))
          .select($"bucket", $"w1", $"w2", $"n_train", $"n_mistakes_r2",
            round(lit(1.0) - $"n_mistakes_r2".cast("double") / $"n_train", 6)
              .as("acc_r2"))
          .orderBy($"bucket")
      },
      Some(s"""WITH tb AS (
        |  SELECT doc_id, any_value(y) AS y, bucket,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM (
        |    SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
        |      ('0x' || substring(md5(tok), 1, 8))::BIGINT % 64 AS bucket
        |    FROM (SELECT doc_id, lang, unnest(${sqlTokens("text")}) AS tok
        |          FROM documents))
        |  GROUP BY doc_id, bucket),
        |w1 AS (
        |  SELECT bucket, CAST(SUM(y * x) AS BIGINT) AS w1
        |  FROM tb GROUP BY bucket),
        |m AS (
        |  SELECT doc_id, any_value(tb.y) AS y,
        |    CAST(SUM(w1.w1 * tb.x) AS BIGINT) AS m0
        |  FROM tb JOIN w1 USING (bucket) GROUP BY doc_id),
        |upd AS (
        |  SELECT bucket, CAST(SUM(tb.y * tb.x) AS BIGINT) AS dw
        |  FROM tb JOIN (SELECT doc_id FROM m WHERE y * m0 <= 0) mi
        |    USING (doc_id)
        |  GROUP BY bucket),
        |st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_train,
        |    CAST(SUM(CASE WHEN y * m0 <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_mistakes_r2
        |  FROM m)
        |SELECT w1.bucket, w1.w1,
        |  w1.w1 + coalesce(upd.dw, 0) AS w2, n_train, n_mistakes_r2,
        |  round(1.0 - CAST(n_mistakes_r2 AS DOUBLE) / n_train, 6) AS acc_r2
        |FROM w1 LEFT JOIN upd USING (bucket) CROSS JOIN st
        |ORDER BY bucket""".stripMargin),
      "2-round batch-perceptron training, integer-exact (trains the " +
        "hashed linear filter the serving queries score with)"),

    // X4 TextRank keyword extraction: 2-round WEIGHTED PageRank over the
    // word co-occurrence graph (adjacent content-word bigrams, undirected,
    // weight = corpus co-occurrence count) — the graph-based keyword
    // scorer from Mihalcea & Tarau (2004), composed from two recipes this
    // engine already oracle-proves: q_bigram_lm's zipped-bigram explode
    // and q_pagerank2's unrolled damped power iteration (literals written
    // identically in both engines; round 6 absorbs double-sum order
    // drift). "Content word" = length >= 4, a deterministic stopword
    // stand-in both engines evaluate identically. Scale shape: the only
    // corpus-sized work is the bigram explode + one (a,b)-keyed
    // partial-agg shuffle; everything after is VOCAB-bounded (Heaps-
    // sublinear in corpus size), so the 2 power-iteration rounds cost
    // O(vocab-edges) regardless of corpus scale — the same reason
    // production TextRank runs per-document or per-corpus-slice without
    // touching documents again after the count pass.
    "q_textrank" -> GQuery(
      (s, d) => {
        import s.implicits._
        // spread: the bigram explode is the only corpus-sized work —
        // parallelize it when the scan under-splits (integer counts
        // downstream, so row placement cannot change values)
        val toks = spread(docs(s, d))
          .select($"doc_id", tokens($"text").as("toks"))
        val bg = toks.filter(size($"toks") >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(toks)-1), " +
              "i -> struct(element_at(toks, i) AS w1, element_at(toks, i+1) AS w2))"))
            .as("bg"))
          .select($"bg.w1", $"bg.w2")
          .filter(length($"w1") >= 4 && length($"w2") >= 4 &&
            $"w1" =!= $"w2")
        // co-occurrence edge table (vocab-bounded after the count pass)
        // consumed by BOTH directions and both rounds — checkpoint so
        // the corpus bigram explode runs once; the 1-row node-count
        // anchor likewise feeds three ranking passes (r13 audit:
        // singlepart x3 from its duplicated subtree)
        val und = bg.select(least($"w1", $"w2").as("a"),
            greatest($"w1", $"w2").as("b"))
          .groupBy($"a", $"b").agg(count(lit(1)).as("wt"))
          .localCheckpoint()
        val e = und.select($"a".as("src"), $"b".as("dst"), $"wt")
          .unionByName(und.select($"b".as("src"), $"a".as("dst"), $"wt"))
        val wdeg = e.groupBy($"src").agg(sum($"wt").as("wd"))
        val nodes = e.select($"src".as("id")).distinct()
        val nn = nodes.agg(count(lit(1)).cast("double").as("n"))
          .localCheckpoint()
        val c1 = e.join(wdeg, "src").crossJoin(broadcast(nn))
          .groupBy($"dst")
          .agg(sum(($"wt".cast("double") / $"wd") / $"n").as("m"))
        val r1 = nodes.crossJoin(broadcast(nn))
          .join(c1, $"id" === $"dst", "left")
          .select($"id",
            ((lit(1.0) - lit(0.85)) / $"n" +
              lit(0.85) * coalesce($"m", lit(0.0))).as("rank"))
        val c2 = e.join(wdeg, "src")
          .join(r1.withColumnRenamed("id", "src"), "src")
          .groupBy($"dst")
          .agg(sum($"rank" * $"wt".cast("double") / $"wd").as("m"))
        nodes.crossJoin(broadcast(nn))
          .join(c2, $"id" === $"dst", "left")
          .select($"id".as("word"),
            round((lit(1.0) - lit(0.85)) / $"n" +
              lit(0.85) * coalesce($"m", lit(0.0)), 6).as("rank2"))
          .orderBy($"word")
      },
      Some(s"""WITH toks AS (
        |  SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents),
        |bg AS (
        |  SELECT toks[CAST(i AS INT)] AS w1,
        |         toks[CAST(i AS INT)+1] AS w2
        |  FROM toks, unnest(generate_series(1, len(toks)-1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |f AS (SELECT w1, w2 FROM bg
        |  WHERE len(w1) >= 4 AND len(w2) >= 4 AND w1 != w2),
        |und AS (
        |  SELECT least(w1, w2) AS a, greatest(w1, w2) AS b,
        |    COUNT(*) AS wt
        |  FROM f GROUP BY 1, 2),
        |e AS (SELECT a AS src, b AS dst, wt FROM und
        |  UNION ALL SELECT b, a, wt FROM und),
        |wdeg AS (SELECT src, SUM(wt) AS wd FROM e GROUP BY src),
        |nodes AS (SELECT DISTINCT src AS id FROM e),
        |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        |c1 AS (
        |  SELECT e.dst AS id,
        |    SUM((CAST(e.wt AS DOUBLE) / wdeg.wd) / nn.n) AS m
        |  FROM e JOIN wdeg ON e.src = wdeg.src CROSS JOIN nn
        |  GROUP BY e.dst),
        |r1 AS (
        |  SELECT nodes.id,
        |    (1.0 - 0.85) / nn.n + 0.85 * COALESCE(c1.m, 0.0) AS rank
        |  FROM nodes CROSS JOIN nn LEFT JOIN c1 ON nodes.id = c1.id),
        |c2 AS (
        |  SELECT e.dst AS id,
        |    SUM(r1.rank * CAST(e.wt AS DOUBLE) / wdeg.wd) AS m
        |  FROM e JOIN wdeg ON e.src = wdeg.src
        |    JOIN r1 ON r1.id = e.src
        |  GROUP BY e.dst),
        |r2 AS (
        |  SELECT nodes.id,
        |    (1.0 - 0.85) / nn.n + 0.85 * COALESCE(c2.m, 0.0) AS rank
        |  FROM nodes CROSS JOIN nn LEFT JOIN c2 ON nodes.id = c2.id)
        |SELECT id AS word, round(rank, 6) AS rank2
        |FROM r2 ORDER BY word""".stripMargin),
      "TextRank keyword scores: 2-round weighted PageRank over the " +
        "word co-occurrence graph (X4, vocab-bounded after one count pass)"),

    // Flesch reading ease per source — the classic readability score a
    // corpus-quality dashboard shows next to q_text_quality's heuristic
    // battery: 206.835 - 1.015*(words/sentences) - 84.6*(syllables/
    // words). Words = the shared whitespace tokenizer; sentences =
    // [.!?]+ runs (min 1); syllables ~= [aeiouy]+ vowel groups over the
    // lowered text (whitespace breaks groups across word boundaries, so
    // no per-word explode is needed — the whole score is one regex pass
    // per doc). Per-doc scores freeze to micro before the per-source
    // mean, so the rollup is an exact integer sum. One scan + one
    // source-keyed agg at any corpus size.
    "q_flesch" -> GQuery(
      (s, d) => {
        import s.implicits._
        docs(s, d)
          .select($"source",
            size(tokens($"text")).cast("long").as("w"),
            greatest(size(expr("regexp_extract_all(text, '[.!?]+', 0)"))
              .cast("long"), lit(1L)).as("st"),
            size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
              .cast("long").as("syl"))
          .filter($"w" > 0)
          .select($"source",
            expr("CAST(round((206.835 - 1.015 * CAST(w AS DOUBLE) / " +
              "CAST(st AS DOUBLE) - 84.6 * CAST(syl AS DOUBLE) / " +
              "CAST(w AS DOUBLE)) * 1000000.0, 0) AS BIGINT)")
              .as("f6"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            expr("CAST(round(CAST(SUM(f6) AS DOUBLE) / " +
              "CAST(COUNT(*) AS DOUBLE), 0) AS BIGINT)")
              .as("flesch_micro"))
          .orderBy($"source")
      },
      Some(s"""WITH sc AS (
        |  SELECT source,
        |    CAST(len(${sqlTokens("text")}) AS BIGINT) AS w,
        |    greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
        |      AS BIGINT), 1) AS st,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS syl
        |  FROM documents),
        |f AS (
        |  SELECT source,
        |    CAST(round((206.835 - 1.015 * CAST(w AS DOUBLE) /
        |      CAST(st AS DOUBLE) - 84.6 * CAST(syl AS DOUBLE) /
        |      CAST(w AS DOUBLE)) * 1000000.0, 0) AS BIGINT) AS f6
        |  FROM sc WHERE w > 0)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(round(CAST(SUM(f6) AS DOUBLE) / CAST(COUNT(*)
        |    AS DOUBLE), 0) AS BIGINT) AS flesch_micro
        |FROM f GROUP BY 1 ORDER BY source""".stripMargin),
      "Flesch reading ease per source (shared tokenizer word counts, " +
        "vowel-group syllables, micro-frozen per-doc scores)"),

    // Token burstiness for the top-20 corpus tokens: the variance-to-
    // mean ratio of per-document counts (zeros included — absent docs
    // contribute only to N) plus the Church-Gale tf/df rate. Content
    // words BURST (a doc that mentions them once mentions them again:
    // VMR >> 1) while function words spread Poisson-like (VMR ~ 1) —
    // the signal that separates topical vocabulary from glue without
    // any lexicon, and a quality feature next to q_tfidf/q_zipf_slope.
    // One explode + (doc, token) rollup, a vocab-bounded token rollup,
    // exact integer moments, top-20 by tf (ties to token).
    "q_burstiness" -> GQuery(
      (s, d) => {
        import s.implicits._
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val perDoc = docs(s, d)
          .select($"doc_id", explode(tokens($"text")).as("tok"))
          .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("x"))
        val nd = docs(s, d).agg(count(lit(1)).as("nn"))
        perDoc.groupBy($"tok")
          .agg(sum($"x").as("tf"), count(lit(1)).as("df"),
            sum($"x".cast(d38) * $"x".cast(d38)).as("sx2"))
          .crossJoin(broadcast(nd))
          .select($"tok", $"tf", $"df",
            expr("CAST(round((CAST(sx2 AS DOUBLE) / CAST(nn AS " +
              "DOUBLE) - CAST(tf AS DOUBLE) / CAST(nn AS DOUBLE) * " +
              "CAST(tf AS DOUBLE) / CAST(nn AS DOUBLE)) / " +
              "(CAST(tf AS DOUBLE) / CAST(nn AS DOUBLE)) * " +
              "1000000.0, 0) AS BIGINT)").as("vmr_micro"),
            expr("CAST(round(CAST(tf AS DOUBLE) / CAST(df AS DOUBLE)" +
              " * 1000000.0, 0) AS BIGINT)").as("rate_micro"))
          .orderBy($"tf".desc, $"tok".asc)
          .limit(20)
      },
      Some(s"""WITH pd AS (
        |  SELECT doc_id, t.tok, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM documents, unnest(${sqlTokens("text")}) AS t(tok)
        |  GROUP BY 1, 2),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM documents),
        |tk AS (
        |  SELECT tok, CAST(SUM(x) AS BIGINT) AS tf,
        |    CAST(COUNT(*) AS BIGINT) AS df,
        |    SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
        |      AS sx2
        |  FROM pd GROUP BY 1)
        |SELECT tok, tf, df,
        |  CAST(round((CAST(sx2 AS DOUBLE) / CAST(nn AS DOUBLE) -
        |    CAST(tf AS DOUBLE) / CAST(nn AS DOUBLE) *
        |    CAST(tf AS DOUBLE) / CAST(nn AS DOUBLE)) /
        |    (CAST(tf AS DOUBLE) / CAST(nn AS DOUBLE)) * 1000000.0, 0)
        |    AS BIGINT) AS vmr_micro,
        |  CAST(round(CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) *
        |    1000000.0, 0) AS BIGINT) AS rate_micro
        |FROM tk, nd ORDER BY tf DESC, tok LIMIT 20""".stripMargin),
      "token burstiness (per-doc VMR, zeros included) + Church-Gale " +
        "tf/df for the top-20 tokens (exact integer moments)"),

    // Unseen-vocabulary estimation: Chao1 richness (bias-corrected
    // form, finite even when no doubletons exist) and the Good-Turing
    // unseen probability mass P0 = F1/N, from the token frequency-of-
    // frequencies — the "how much vocabulary has this corpus NOT
    // shown me yet" readout that tells a pipeline whether more
    // crawling buys new tokens or more of the same. One explode +
    // vocab-bounded count-of-counts rollup; all counts exact.
    "q_chao1" -> GQuery(
      (s, d) => {
        import s.implicits._
        val tf = docs(s, d)
          .select(explode(tokens($"text")).as("tok"))
          .groupBy($"tok").agg(count(lit(1)).as("tf"))
        tf.agg(count(lit(1)).as("vocab"), sum($"tf").as("n_tokens"),
            sum(($"tf" === 1L).cast("long")).as("f1"),
            sum(($"tf" === 2L).cast("long")).as("f2"))
          .select($"vocab", $"n_tokens", $"f1", $"f2",
            expr("CAST(round(CAST(vocab AS DOUBLE) + " +
              "CAST(f1 AS DOUBLE) * CAST(f1 - 1 AS DOUBLE) / " +
              "(2.0 * CAST(f2 + 1 AS DOUBLE)), 0) AS BIGINT)")
              .as("chao1_est"),
            expr("CAST(round(CAST(f1 AS DOUBLE) / " +
              "CAST(n_tokens AS DOUBLE) * 1000000.0, 0) AS BIGINT)")
              .as("p0_micro"))
      },
      Some(s"""WITH tf AS (
        |  SELECT t.tok, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM documents, unnest(${sqlTokens("text")}) AS t(tok)
        |  GROUP BY 1),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
        |    CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |    CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS f1,
        |    CAST(SUM(CASE WHEN tf = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS f2
        |  FROM tf)
        |SELECT vocab, n_tokens, f1, f2,
        |  CAST(round(CAST(vocab AS DOUBLE) + CAST(f1 AS DOUBLE) *
        |    CAST(f1 - 1 AS DOUBLE) / (2.0 * CAST(f2 + 1 AS DOUBLE)),
        |    0) AS BIGINT) AS chao1_est,
        |  CAST(round(CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) *
        |    1000000.0, 0) AS BIGINT) AS p0_micro
        |FROM m""".stripMargin),
      "Chao1 unseen-vocabulary estimate + Good-Turing unseen mass " +
        "from the token frequency-of-frequencies (exact counts)"),

    // Cross-document boilerplate detection at phrase granularity — the
    // C4 repeated-line rule re-expressed for whitespace corpora: a
    // word 5-gram appearing verbatim in >= 10 DISTINCT documents is
    // boilerplate (headers, footers, license blurbs, templated spans),
    // and each source is scored by the fraction of its documents'
    // distinct 5-grams that are boilerplate — the first number a
    // curation pass checks before trusting a crawl source. Scale
    // shape: distinct (doc, gram) explode -> gram-keyed doc-frequency
    // (partial-agg shuffle) -> semi-join back -> doc + source rollups;
    // no pair joins, no windows. Docs under 5 tokens carry no 5-gram
    // and are excluded from the denominator (stated).
    "q_boilerplate" -> GQuery(
      (s, d) => {
        import s.implicits._
        // r15: materialized once — three consumers (doc-frequency
        // screen, per-doc boilerplate counts, per-doc gram totals) each
        // rebuilt the scan+explode+md5+distinct subtree in the lazy
        // plan (6 Generate nodes in the before-plan); the distinct
        // (doc, gram-hash) table is the derived index a production run
        // materializes anyway (the q_lsh_bucket_join rationale)
        val g = spread(docs(s, d).select($"doc_id", $"source", $"text"))
          .withColumn("toks", tokens($"text"))
          .filter(size($"toks") >= 5)
          .select($"doc_id", $"source", explode(expr(
            "transform(sequence(1, size(toks)-4), " +
              "i -> md5(concat_ws(' ', slice(toks, i, 5))))"))
            .as("g"))
          .distinct()
          .cut
        val bp = g.groupBy($"g")
          .agg(countDistinct($"doc_id").as("df"))
          .filter($"df" >= 10).select($"g")
        val perDoc = g.join(bp, Seq("g"), "left_semi")
          .groupBy($"doc_id").agg(count(lit(1)).as("n_bp"))
        g.groupBy($"doc_id", $"source").agg(count(lit(1)).as("n_g"))
          .join(perDoc, Seq("doc_id"), "left")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_g").as("n_grams"),
            sum(coalesce($"n_bp", lit(0L))).as("n_bp_grams"))
          .select($"source", $"n_docs", $"n_grams", $"n_bp_grams",
            expr("CAST(round(CAST(n_bp_grams AS DOUBLE) / " +
              "CAST(n_grams AS DOUBLE) * 1000000.0, 0) AS BIGINT)")
              .as("bp_frac_micro"))
          .orderBy($"source")
      },
      Some(s"""WITH t AS (
        |  SELECT doc_id, source, ${sqlTokens("text")} AS toks
        |  FROM documents),
        |g0 AS (
        |  SELECT doc_id, source,
        |    unnest(list_transform(generate_series(1, len(toks)-4),
        |      i -> md5(array_to_string(toks[i:i+4], ' ')))) AS g
        |  FROM t WHERE len(toks) >= 5),
        |gt AS (SELECT DISTINCT doc_id, source, g FROM g0),
        |bp AS (
        |  SELECT g FROM (
        |    SELECT g, COUNT(DISTINCT doc_id) AS df FROM gt GROUP BY 1)
        |  WHERE df >= 10),
        |pd AS (
        |  SELECT gt.doc_id, gt.source,
        |    CAST(COUNT(*) AS BIGINT) AS n_g,
        |    CAST(SUM(CASE WHEN bp.g IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_bp
        |  FROM gt LEFT JOIN bp ON gt.g = bp.g
        |  GROUP BY 1, 2)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_g) AS BIGINT) AS n_grams,
        |  CAST(SUM(n_bp) AS BIGINT) AS n_bp_grams,
        |  CAST(round(CAST(SUM(n_bp) AS DOUBLE) /
        |    CAST(SUM(n_g) AS DOUBLE) * 1000000.0, 0) AS BIGINT)
        |    AS bp_frac_micro
        |FROM pd GROUP BY 1 ORDER BY source""".stripMargin),
      "cross-doc boilerplate score per source: fraction of distinct " +
        "word 5-grams appearing in >= 10 documents (C4 line-dedup at " +
        "phrase granularity)"),

    // CCNet-style perplexity bucketing: per-doc bigram cross-entropy
    // (the q_bigram_lm add-1 corpus LM, frozen to integer micro) cut
    // at corpus terciles into head/middle/tail quality buckets, with
    // per-(lang, bucket) doc and bigram counts — THE operation CCNet
    // runs to split a crawl by LM quality before sampling. Tercile
    // thresholds come from one percentile anchor over the per-doc
    // score table; that table is cached once (it is the score product
    // a production run materializes anyway) so the corpus LM join
    // builds it a single time, and the only post-score passes are the
    // 1-row anchor and the bounded (lang x bucket) rollup.
    "q_ppl_bucket" -> GQuery(
      (s, d) => {
        import s.implicits._
        val corpus = docs(s, d).select($"doc_id", $"lang", $"text")
        // r15: one materialized bigram table shared by the LM build and
        // the scoring pass (the plan re-tokenized the corpus for each)
        val bgT = pplBigrams(corpus).cut
        val ce = pplCeFrom(bgT, pplLmFrom(bgT, corpus)).cut
        val th = ce.agg(
          expr("percentile(ce6, 0.3333333333333333)").as("t1"),
          expr("percentile(ce6, 0.6666666666666666)").as("t2"))
        ce.crossJoin(broadcast(th))
          .select($"lang", $"n_bigrams", expr(pplBucketE).as("bucket"))
          .groupBy($"lang", $"bucket")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_bigrams").as("sum_bigrams"))
          .orderBy($"lang", $"bucket")
      },
      Some(s"""WITH toks AS (
        |  SELECT doc_id, lang, ${sqlTokens("text")} AS toks
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, lang, toks[CAST(i AS INT)] AS w1,
        |    toks[CAST(i AS INT) + 1] AS w2
        |  FROM toks, unnest(generate_series(1, len(toks)-1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |lm AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM bg GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(SUM(n_ab) AS BIGINT) AS n_a
        |  FROM lm GROUP BY 1),
        |vocab AS (
        |  SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
        |  FROM (SELECT unnest(toks) AS tok FROM toks)),
        |scored AS (
        |  SELECT w1, w2,
        |    CAST(round(ln(CAST(n_ab + 1 AS DOUBLE) /
        |      CAST(n_a + v AS DOUBLE)), 9) AS DECIMAL(18,9)) AS sc
        |  FROM lm JOIN ctx USING (w1), vocab),
        |ce AS (
        |  SELECT doc_id, lang,
        |    CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    CAST(round(-CAST(SUM(sc) AS DOUBLE) / CAST(COUNT(*)
        |      AS DOUBLE) * 1000000.0, 0) AS BIGINT) AS ce6
        |  FROM bg JOIN scored USING (w1, w2) GROUP BY 1, 2),
        |th AS (
        |  SELECT quantile_cont(ce6, 0.3333333333333333) AS t1,
        |    quantile_cont(ce6, 0.6666666666666666) AS t2
        |  FROM ce)
        |SELECT lang,
        |  CASE WHEN ce6 <= t1 THEN 'head' WHEN ce6 <= t2
        |    THEN 'middle' ELSE 'tail' END AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_bigrams) AS BIGINT) AS sum_bigrams
        |FROM ce, th GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin),
      "CCNet perplexity buckets: per-doc bigram cross-entropy cut at " +
        "corpus terciles into head/middle/tail, per (lang, bucket) " +
        "doc + bigram counts"),
  )

  /** The add-1 bigram LM score table `(w1, w2, sc DECIMAL(18,9))`
    * trained on `corpus` (`doc_id`, `lang`, `text`) — the q_bigram_lm
    * construction. Public because [[graft.streaming.QualityStream]]
    * calibrates its frozen scoring LM with the SAME tree. */
  def pplLm(corpus: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    pplLmFrom(pplBigrams(corpus), corpus)

  /** [[pplLm]] over an already-built bigram table — lets a batch caller
    * materialize [[pplBigrams]] ONCE and share it between the LM build
    * and the [[pplCeFrom]] scoring pass (r15: q_ppl_bucket's lazy plan
    * re-ran the corpus tokenize+explode for each). `corpus` is still
    * needed for the vocabulary count (it must see 1-token docs that
    * carry no bigram). */
  def pplLmFrom(bg: org.apache.spark.sql.DataFrame,
      corpus: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import corpus.sparkSession.implicits._
    val lm = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("n_ab"))
    val ctx = lm.groupBy($"w1").agg(sum($"n_ab").as("n_a"))
    val vocab = corpus
      .select(explode(Fns.tokens($"text")).as("tok"))
      .agg(countDistinct($"tok").as("v"))
    lm.join(ctx, "w1").crossJoin(broadcast(vocab))
      .select($"w1", $"w2",
        round(log(($"n_ab" + 1).cast("double") /
          ($"n_a" + $"v").cast("double")), 9)
          .cast("decimal(18,9)").as("sc"))
  }

  /** Per-doc integer-micro bigram cross-entropy `(doc_id, lang,
    * n_bigrams, ce6)` of `corpus` against the frozen LM table
    * `scored` — one expression tree shared by live `q_ppl_bucket`
    * and the streaming quality monitor (bigrams outside the LM drop
    * in the inner join, and a doc with no scored bigram drops
    * entirely — the frozen-LM contract, stated). */
  def pplCe(corpus: org.apache.spark.sql.DataFrame,
      scored: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    pplCeFrom(pplBigrams(corpus), scored)

  /** [[pplCe]] over an already-built bigram table (see [[pplLmFrom]]). */
  def pplCeFrom(bg: org.apache.spark.sql.DataFrame,
      scored: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import bg.sparkSession.implicits._
    bg.join(scored, Seq("w1", "w2"))
      .groupBy($"doc_id", $"lang")
      .agg(count(lit(1)).as("n_bigrams"), sum($"sc").as("ssum"))
      .select($"doc_id", $"lang", $"n_bigrams",
        expr("CAST(round(-CAST(ssum AS DOUBLE) / " +
          "CAST(n_bigrams AS DOUBLE) * 1000000.0, 0) AS BIGINT)")
          .as("ce6"))
  }

  /** Tercile bucket of a `ce6` column against `t1`/`t2` thresholds in
    * scope — the one CASE both tiers share. */
  val pplBucketE: String =
    "CASE WHEN ce6 <= t1 THEN 'head' WHEN ce6 <= t2 " +
      "THEN 'middle' ELSE 'tail' END"

  /** Per-document TOTAL bigram count `(doc_id, lang, tot_bigrams)` —
    * the denominator [[QualityStream]] needs to make the frozen-LM
    * score join's silent drops observable: `tot_bigrams` minus
    * [[pplCe]]'s matched `n_bigrams` is the OOV mass the inner join
    * discarded (r13 VERDICT Next #6). */
  def pplDocBigramCounts(corpus: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import corpus.sparkSession.implicits._
    pplBigrams(corpus).groupBy($"doc_id", $"lang")
      .agg(count(lit(1)).as("tot_bigrams"))
  }

  /** Exploded `(doc_id, lang, w1, w2)` bigrams of a corpus. */
  private def pplBigrams(corpus: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import corpus.sparkSession.implicits._
    corpus.select($"doc_id", $"lang", Fns.tokens($"text").as("toks"))
      .filter(size($"toks") >= 2)
      .select($"doc_id", $"lang", explode(expr(
        "transform(sequence(1, size(toks)-1), " +
          "i -> struct(element_at(toks, i) AS w1, " +
          "element_at(toks, i+1) AS w2))")).as("bg"))
      .select($"doc_id", $"lang", $"bg.w1", $"bg.w2")
  }
}
