package graft.operators

import graft.{Fns, GQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * codegen. State is `localCheckpoint`ed per round: same iterative-lineage
  * rule as [[Dedup.clusters]].
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
    var state = wordState(docs, textCol).localCheckpoint()
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
        state = applyMerge(state, p1, p2).localCheckpoint()
        rank += 1
      }
    }
    (merges.result(), state)
  }

  val queries: Seq[(String, GQuery)] = Seq(
    // X4 iterative BPE training — 5 merge rounds over the documents
    // corpus. Not SQL-expressible (a data-dependent loop), so the driver
    // records a rows-only check; the merge semantics are golden-tested
    // against an independent single-machine reference in BpeSpec.
    "q_bpe_merges" -> GQuery(
      (s, d) => {
        import s.implicits._
        val (merges, _) = train(
          Tables.load(s, d, "documents"), col("text"), numMerges = 5)
        merges.toDF("rank", "p1", "p2", "n").orderBy($"rank")
      },
      None,
      "iterative BPE merge training, 5 rounds (extension X4)"),

    // X4 tokenizer application: train 5 merges, then ENCODE the corpus
    // with them — the distinct-word table is encoded once (5 narrow
    // projections, no shuffle) and broadcast-joined back, so each doc
    // reports its subword-token statistics. Rows-only like q_bpe_merges
    // (the training loop is data-dependent); encode semantics are
    // golden-tested against the independent reference in BpeSpec.
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
      None,
      "BPE tokenizer application: per-doc subword statistics (extension X4)"),
  )
}
