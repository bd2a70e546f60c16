package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH banding near-duplicate detection (SURVEY.md §2.11 X2) —
  * the sub-linear scale path that replaces the brute-force all-pairs
  * Jaccard join of `q_ngram_jaccard`.
  *
  * Everything is built-in expressions (sequence/transform/array_min/
  * xxhash64) — no UDFs, no ML pipeline: the signature computation is a
  * per-row projection; the only shuffle is the band-bucket self-join, whose
  * size is controlled by (bands, rowsPerBand).
  *
  * Standard LSH guarantee: two docs with Jaccard similarity s collide in
  * at least one band with probability 1 - (1 - s^r)^b — tune (b, r) to
  * place the S-curve threshold at the desired similarity.
  *
  * 100 TB notes: candidate generation shuffles only (band, bandHash,
  * docId) triples — constant size per doc regardless of text length. Hot
  * buckets (boilerplate-heavy corpora) are capped with `maxBucketSize`
  * before pairing to bound the quadratic blowup inside one bucket.
  */
object MinHash {

  /** Distinct word n-gram shingles of a token array. Docs shorter than n
    * tokens yield ONE truncated shingle (their whole text): the stop bound
    * clamps to 1 because Spark's `sequence(1, stop)` DESCENDS through 0
    * when stop < 1, and `slice(_, 0, _)` throws — and an empty shingle set
    * would make `array_min` return a null signature anyway. */
  def shingles(tokens: Column, n: Int): Column =
    array_distinct(
      transform(sequence(lit(1), greatest(size(tokens) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(tokens, i, lit(n)))))

  /** k-permutation MinHash signature: element i is min over shingles of a
    * seed-i hash (xxhash64 over (shingle, seed)). */
  def signature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleCol, s => xxhash64(s, i))))

  /** Signature -> (band index, band hash) structs for LSH bucketing. */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      j => struct(
        j.as("band"),
        xxhash64(slice(sig, j * rowsPerBand + lit(1), lit(rowsPerBand))).as("h")))

  /** Estimated Jaccard = fraction of agreeing signature positions. */
  def estJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (a, b) => a === b), x => x))
      .cast("double") / size(sigA)

  /** Candidate pairs via band-bucket join: docs sharing any band bucket.
    * Input must carry `idCol` and a signature column `sigCol`. */
  def candidatePairs(
      df: DataFrame,
      idCol: String,
      sigCol: String,
      bands: Int,
      rowsPerBand: Int,
      maxBucketSize: Int = 1000): DataFrame = {
    val buckets = df
      .select(col(idCol), explode(bandHashes(col(sigCol), bands, rowsPerBand))
        .as("bh"))
      .select(col(idCol), col("bh.band").as("band"), col("bh.h").as("h"))
    // cap pathological buckets (boilerplate shingle sets) before pairing;
    // an Int.MaxValue cap can never bind, so skip the window entirely
    // rather than paying its shuffle+sort to evaluate a vacuous filter
    val capped =
      if (maxBucketSize == Int.MaxValue) buckets
      else buckets
        .withColumn("bucket_n",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy("band", "h")))
        .filter(col("bucket_n") <= maxBucketSize)
        .drop("bucket_n")
    val a = capped.as("a")
    val b = capped.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"))
      .distinct()
  }

  /** Signature via EXPLODE + per-seed min AGGREGATES: value-identical to
    * [[signature]] (element i = min over shingles of `xxhash64(shingle,
    * i)`) but the hot path is `numHashes` codegen'd min-aggregate columns
    * with map-side partials instead of `numHashes` INTERPRETED
    * higher-order passes over the shingle array per row — at sf1 the HOF
    * form spent 185 s of q_minhash_lsh's 195 s in that interpreter loop
    * (round-6 full-surface sweep); this shape runs the same hashes inside
    * WholeStageCodegen and shuffles only (doc, 64 longs). */
  def signatureAgg(
      df: DataFrame,
      idCol: String,
      tokensCol: Column,
      shingleSize: Int,
      numHashes: Int): DataFrame = {
    val ex = df.select(col(idCol),
      explode(shingles(tokensCol, shingleSize)).as("__sh"))
    val mins = (0 until numHashes)
      .map(i => min(xxhash64(col("__sh"), lit(i))).as(s"__m$i"))
    ex.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(i => col(s"__m$i")): _*).as("sig"))
  }

  /** Full near-dup pass: shingle -> sign -> band -> candidate pairs ->
    * signature-estimated Jaccard filter. Returns (id1, id2, est_jaccard). */
  def nearDuplicates(
      df: DataFrame,
      idCol: String,
      tokensCol: Column,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    val signed = signatureAgg(df, idCol, tokensCol, shingleSize, numHashes)
      .cache()
    val pairs = candidatePairs(signed, idCol, "sig", bands, rowsPerBand)
    pairs
      .join(signed.select(col(idCol).as("id1"), col("sig").as("sig1")), "id1")
      .join(signed.select(col(idCol).as("id2"), col("sig").as("sig2")), "id2")
      .select(col("id1"), col("id2"),
        estJaccard(col("sig1"), col("sig2")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }
}
