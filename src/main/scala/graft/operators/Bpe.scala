package graft.operators

import graft.{Fns, GQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Checkpoint.CutOps

/** Byte-pair-encoding merge training as a DISTRIBUTED iterative operator
  * (SURVEY.md §2.11 X4 extension; q_bpe_pairs computes one merge step's
  * statistics, this runs the actual merge loop).
  *
  * Per iteration: (1) count adjacent symbol pairs across the corpus,
  * frequency-weighted — an explode + partial-agg shuffle, linear in corpus
  * symbols; (2) take the argmax pair (ties broken lexicographically) — a
  * top-1 collect of ONE row, the only driver state, bounded by the number
  * of merges exactly like a real tokenizer trainer's vocab; (3) rewrite
  * every word's symbol array with the merged pair — a per-row higher-order
  * `aggregate` fold (left-to-right, non-overlapping), no UDF, stays in
  * codegen. State is lineage-cut per round via [[Checkpoint.cut]]: same
  * iterative-lineage rule as [[Dedup.clusters]], fault-tolerant under
  * `spark.graft.checkpoint.mode=reliable`.
  *
  * Scale: the per-iteration cost is one map-side-combined shuffle of
  * distinct pairs (vocabulary-sized, not corpus-sized, after the partial
  * agg) + one narrow rewrite. Production trainers run this on a word-count
  * TABLE (distinct word, freq) — which is what [[wordState]] builds — so
  * corpus size only enters through the one-time word count.
  */
object Bpe {
  import Fns._

  /** Initial trainer state: one row per DISTINCT word with its corpus
    * frequency and the word split into single-character symbols. */
  def wordState(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(tokens(textCol)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))

  /** Frequency-weighted adjacent-pair counts over the current state. */
  def pairCounts(state: DataFrame): DataFrame =
    state.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(syms)-1), " +
          "i -> struct(element_at(syms, i) AS p1, element_at(syms, i+1) AS p2))"))
        .as("pr"))
      .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .agg(sum(col("freq")).as("n"))

  /** One merge applied to every word: adjacent [p1, p2] becomes [p1p2],
    * left-to-right, non-overlapping (standard BPE greedy semantics). */
  def applyMerge(state: DataFrame, p1: String, p2: String): DataFrame = {
    val a = lit(p1); val b = lit(p2)
    state.withColumn("syms",
      expr("""aggregate(
        sequence(1, size(syms)),
        named_struct('out', CAST(array() AS ARRAY<STRING>), 'skip', false),
        (s, i) -> IF(s.skip,
          named_struct('out', s.out, 'skip', false),
          IF(i < size(syms)
               AND element_at(syms, i) = GRAFT_P1
               AND element_at(syms, i + 1) = GRAFT_P2,
            named_struct('out', array_append(s.out, GRAFT_P1 || GRAFT_P2),
              'skip', true),
            named_struct('out', array_append(s.out, element_at(syms, i)),
              'skip', false))),
        s -> s.out)"""
        .replace("GRAFT_P1", s"'${p1.replace("'", "\\'")}'")
        .replace("GRAFT_P2", s"'${p2.replace("'", "\\'")}'")))
  }

  /** Tokenizer APPLICATION: folds a learned merge list (in rank order)
    * over a symbolized word table — each merge is one narrow per-row
    * rewrite, so encoding is `numMerges` chained projections with no
    * shuffle. Production shape: encode the DISTINCT-word table once,
    * broadcast-join the subword arrays back to the corpus (words repeat;
    * the corpus never re-tokenizes per occurrence). */
  def encodeWords(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(words) { case (df, (p1, p2)) => applyMerge(df, p1, p2) }

  /** Run `numMerges` BPE iterations; returns the learned merge table
    * (rank, p1, p2, weighted count) and the final symbolized state. */
  def train(docs: DataFrame, textCol: Column, numMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    var state = wordState(docs, textCol).cut
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = pairCounts(state)
        .orderBy(col("n").desc, col("p1"), col("p2"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val r = top.head
        val (p1, p2, n) = (r.getString(0), r.getString(1), r.getLong(2))
        merges += ((rank + 1, p1, p2, n))
        rank += 1
        // r15: materialize the merged state only when a FURTHER round
        // will scan it — the last round's eager applyMerge+cut was dead
        // work for every current caller (all consume only the merge
        // table); the returned final state is the same DataFrame, lazy,
        // computed on demand by any future consumer
        state =
          if (rank < numMerges) applyMerge(state, p1, p2).cut
          else applyMerge(state, p1, p2)
      }
    }
    (merges.result(), state)
  }

  /** One DuckDB training round for the q_bpe_encode oracle: pair counts
    * over state k-1, the (n DESC, p1, p2) argmax, and the merge applied to
    * every word. The merge fold mirrors [[applyMerge]]'s (out, skip) state
    * machine exactly, but DuckDB 1.0's `list_reduce` has no initial
    * accumulator and mis-chains struct accumulators, so the state rides in
    * a STRING: first char = skip flag ('S'/'N'), rest = emitted symbols
    * joined by chr(31) (a unit separator that whitespace-delimited tokens
    * cannot contain); a leading 'N' sentinel element seeds the fold. */
  private def oracleRoundSql(k: Int): String = s"""
    |pc$k AS (
    |  SELECT p.p1 AS p1, p.p2 AS p2, CAST(SUM(freq) AS BIGINT) AS n
    |  FROM (SELECT freq, unnest(list_transform(generate_series(1, len(syms)-1),
    |          i -> {'p1': syms[i], 'p2': syms[i+1]})) AS p
    |        FROM state${k - 1} WHERE len(syms) >= 2)
    |  GROUP BY 1, 2),
    |m$k AS (SELECT p1, p2, n FROM pc$k ORDER BY n DESC, p1, p2 LIMIT 1),
    |state$k AS (
    |  SELECT word, freq,
    |    string_split(substr(list_reduce(
    |      ['N'] || list_transform(generate_series(1, len(syms)), j -> CAST(j AS VARCHAR)),
    |      (acc, x) -> CASE
    |        WHEN substr(acc, 1, 1) = 'S' THEN 'N' || substr(acc, 2)
    |        WHEN CAST(x AS INT) < len(syms)
    |             AND syms[CAST(x AS INT)] = p1 AND syms[CAST(x AS INT) + 1] = p2
    |        THEN 'S' || CASE WHEN substr(acc, 2) = '' THEN ''
    |                    ELSE substr(acc, 2) || chr(31) END || p1 || p2
    |        ELSE 'N' || CASE WHEN substr(acc, 2) = '' THEN ''
    |                    ELSE substr(acc, 2) || chr(31) END || syms[CAST(x AS INT)]
    |      END), 2), chr(31)) AS syms
    |  FROM state${k - 1}, m$k)""".stripMargin

  /** Shared oracle prefix: word state + `numMerges` unrolled training
    * rounds (the q_pagerank2 treatment for iterative operators). Used by
    * BOTH BPE oracles, so trainer replay semantics are written once. */
  private def trainOracleCtes(numMerges: Int): String = s"""
    |WITH toks AS (
    |  SELECT doc_id, unnest(${sqlTokens("text")}) AS word FROM documents),
    |state0 AS (
    |  SELECT word, COUNT(*) AS freq,
    |    list_transform(generate_series(1, len(word)),
    |      i -> substring(word, CAST(i AS INT), 1)) AS syms
    |  FROM toks GROUP BY word),
    |${(1 to numMerges).map(oracleRoundSql).mkString(",")}""".stripMargin

  /** q_bpe_merges oracle: the replayed loop's per-round argmax rows —
    * (rank, p1, p2, weighted count) straight from each round's `m_k` CTE,
    * so the hash match pins every round's pair statistics AND tie-break
    * against a second engine (previously golden-tested only). */
  private def mergesOracleSql(numMerges: Int): String =
    trainOracleCtes(numMerges) + s"""
    |SELECT * FROM (
    |${(1 to numMerges).map(k =>
        s"  SELECT CAST($k AS INT) AS rank, p1, p2, n FROM m$k")
        .mkString("  UNION ALL\n")}
    |) ORDER BY rank""".stripMargin

  /** Full q_bpe_encode oracle: replays the ENTIRE 5-round training loop in
    * DuckDB, then scores each document against the final state. The
    * encode of the distinct-word table IS the trained state after 5
    * merges (training and [[encodeWords]] run the identical fold in the
    * identical rank order), so `state5` doubles as the subword lookup. */
  private def encodeOracleSql(numMerges: Int): String =
    trainOracleCtes(numMerges) + s""",
    |enc AS (SELECT word, CAST(len(syms) AS BIGINT) AS n_sub
    |        FROM state$numMerges)
    |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
    |  CAST(SUM(n_sub) AS BIGINT) AS n_subwords,
    |  round(CAST(SUM(n_sub) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
    |    AS subwords_per_word
    |FROM toks JOIN enc USING (word)
    |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Seq[(String, GQuery)] = Seq(
    // X4 iterative BPE training — 5 merge rounds over the documents
    // corpus. ORACLE-CHECKED (VERDICT r6 #3): the data-dependent loop is
    // replayed in DuckDB as 5 unrolled CTE rounds (the q_bpe_encode /
    // q_pagerank2 recipe) and each round's argmax row compared — so the
    // hash match pins pair counting, tie-breaking, and the merge rewrite
    // per round; semantics additionally golden-tested in BpeSpec.
    "q_bpe_merges" -> GQuery(
      (s, d) => {
        import s.implicits._
        val (merges, _) = train(
          Tables.load(s, d, "documents"), col("text"), numMerges = 5)
        merges.toDF("rank", "p1", "p2", "n").orderBy($"rank")
      },
      Some(mergesOracleSql(5)),
      "iterative BPE merge training, 5 rounds (extension X4)"),

    // X4 tokenizer application: train 5 merges, then ENCODE the corpus
    // with them — the distinct-word table is encoded once (5 narrow
    // projections, no shuffle) and broadcast-joined back, so each doc
    // reports its subword-token statistics. ORACLE-CHECKED (VERDICT r5
    // #4): the DuckDB side replays the whole data-dependent training loop
    // as 5 unrolled CTE rounds plus the same doc-level join, so the hash
    // match pins trainer AND encoder against a second engine at every SF;
    // encode semantics are additionally golden-tested in BpeSpec.
    "q_bpe_encode" -> GQuery(
      (s, d) => {
        import s.implicits._
        val docs = Tables.load(s, d, "documents")
        val (merges, _) = train(docs, col("text"), numMerges = 5)
        val toks = docs.select($"doc_id", explode(tokens($"text")).as("word"))
        val words = toks.select($"word").distinct()
          .withColumn("syms", expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
        val enc = encodeWords(words, merges.map(m => (m._2, m._3)))
          .select($"word", size($"syms").as("n_sub"))
        toks.join(broadcast(enc), "word")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_words"), sum($"n_sub").as("n_subwords"))
          .select($"doc_id", $"n_words", $"n_subwords",
            round($"n_subwords".cast("double") / $"n_words".cast("double"), 6)
              .as("subwords_per_word"))
          .orderBy($"doc_id")
      },
      Some(encodeOracleSql(5)),
      "BPE tokenizer application: per-doc subword statistics (extension X4)"),
  )
}
