package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Re-aggregatable count-min sketches for heavy-hitter token counting
  * (SURVEY.md §2.11 X4 extension tier — the frequency companion of the
  * HLL distinct-count partials in Analytics).
  *
  * At 100 TB exact per-token counts are a monster shuffle of the full
  * vocabulary; the CMS answer is a fixed (depth × width) counter grid per
  * scope, built map-side by Spark's built-in `count_min_sketch` aggregate
  * (codegen'd, Datasketches-compatible layout from
  * org.apache.spark.util.sketch). CMS merge is plain counter addition, so
  * per-scope partials union-merge into EXACTLY the sketch a direct global
  * build produces (bit-identical with a fixed seed — asserted in
  * CmsSketchSpec), i.e. any rollup is answerable from stored partials with
  * no rescan. Estimates are biased high only: true ≤ est ≤ true + ε·N with
  * confidence 1−δ.
  */
object CmsSketch {

  /** Deterministic seed — sketches must be reproducible run to run. */
  val Seed = 42

  /** Per-`scope` token sketches: one (scope, cms binary) row per scope.
    * eps/confidence size the grid: width = ⌈e/ε⌉, depth = ⌈ln(1/δ)⌉. */
  def tokenSketches(
      docs: DataFrame, scope: Column, text: Column,
      eps: Double = 0.001, confidence: Double = 0.99): DataFrame = {
    docs
      .select(scope.as("scope"), explode(graft.Fns.tokens(text)).as("tok"))
      .groupBy(col("scope"))
      .agg(count_min_sketch(col("tok"), lit(eps), lit(confidence),
        lit(Seed)).as("cms"))
  }

  /** Union-merge serialized sketches (counter addition — exact). */
  def merge(sketches: Seq[Array[Byte]]): CountMinSketch = {
    require(sketches.nonEmpty, "nothing to merge")
    val head = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketches.head))
    sketches.tail.foldLeft(head) { (acc, bytes) =>
      acc.mergeInPlace(CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes)))
    }
  }

  /** Estimate via the UTF-8 binary path — the SQL aggregate adds string
    * values as their UTF-8 bytes, so probing must hash the same bytes. */
  def estimate(cms: CountMinSketch, item: String): Long =
    cms.estimateCount(item.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
