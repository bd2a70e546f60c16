package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.{Column, DataFrame}

/** Re-aggregatable KLL quantile sketches — the QUANTILE member of the
  * stored-partials sketch family (HLL/theta for distincts, CMS for heavy
  * hitters, Bloom for membership; quantiles were the missing axis).
  *
  * Why stored quantile partials at 100 TB: `percentile()` needs a sort
  * buffer over every group and `approx_percentile` still rescans the
  * corpus per question. KLL partials are built in ONE pass (constant
  * ~3 KB per scope x partition at k=200), stored next to the corpus,
  * and any later quantile question — new percentiles, coarser scopes via
  * [[merge]], cross-snapshot drift — is answered from the partials
  * without rescanning. Mergeability is exact: a KLL merge of partials
  * carries the SAME published rank-error guarantee as a single sketch
  * fed the concatenated stream (Karnin-Lang-Liberty, FOCS'16, thm 1).
  *
  * Determinism: unlike the theta/HLL/CMS partials, KLL compaction flips
  * random coins, so estimated VALUES vary run to run. Queries built on
  * it therefore self-check the published contract instead of hashing
  * values: the exact rank of each estimated quantile must fall inside
  * `[getRankLowerBound(p), getRankUpperBound(p)]` (99% confidence,
  * +-1.65% normalized rank error at k=200) — the q_hll_distinct
  * recipe, with the row COUNT deterministic for the driver's check.
  */
object QuantileSketch {

  /** Sketch size/accuracy parameter: k=200 -> ~1.65% rank error @99%. */
  val K = 200

  /** One corpus pass -> per-(input partition, scope) serialized KLL rows
    * `(scope string, kll binary)`. No shuffle: partials are emitted
    * map-side (the [[ThetaSketch.partials]] shape); callers persist them
    * or roll them up with [[merge]]. Nulls in either column are skipped.
    * Per-partition state: one ~3 KB sketch per scope. */
  def partials(df: DataFrame, scopeCol: Column, valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(scopeCol.cast("string").as("scope"),
        valueCol.cast("double").as("v"))
      .as[(String, Option[Double])]
      .mapPartitions { it =>
        val builders =
          scala.collection.mutable.HashMap.empty[String, KllDoublesSketch]
        it.foreach { case (scope, v) =>
          if (scope != null && v.isDefined)
            builders.getOrElseUpdate(scope,
              KllDoublesSketch.newHeapInstance(K)).update(v.get)
        }
        builders.iterator.map { case (scope, sk) =>
          (scope, sk.toByteArray)
        }
      }
      .toDF("scope", "kll")
  }

  /** Merge serialized partials into one sketch (error bound preserved). */
  def merge(parts: Iterator[Array[Byte]]): KllDoublesSketch = {
    val m = KllDoublesSketch.newHeapInstance(K)
    parts.foreach(b => m.merge(KllDoublesSketch.heapify(Memory.wrap(b))))
    m
  }

  /** Quantile estimates + the published rank-confidence envelope for each
    * requested rank: (p, estimate, rank_lb, rank_ub). INCLUSIVE search
    * (estimate's exact rank counts values <= it), matching the
    * `avg(v <= est)` formulation a self-checking query verifies with. */
  def quantilesWithBounds(sk: KllDoublesSketch, ps: Seq[Double])
      : Seq[(Double, Double, Double, Double)] =
    ps.map { p =>
      (p, sk.getQuantile(p, QuantileSearchCriteria.INCLUSIVE),
        sk.getRankLowerBound(p), sk.getRankUpperBound(p))
    }
}
