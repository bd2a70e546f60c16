package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KLL quantile-sketch partials: the merged-partials estimate must honor
  * the published rank-error envelope regardless of partitioning, the
  * serialized form must roundtrip, and merge must carry the SAME bound a
  * single directly-fed sketch has (the property that makes the partials
  * storable). Values themselves are not asserted bit-for-bit — KLL
  * compaction is randomized by design; the CONTRACT is the invariant. */
class KllSketchSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  /** Exact inclusive rank of v in the data. */
  private def rankOf(data: Seq[Double], v: Double): Double =
    data.count(_ <= v).toDouble / data.size

  private def mergedOver(data: Seq[Double], parts: Int) = {
    val df = data.map(("g", _)).toDF("sc", "v").repartition(parts)
    val rows = QuantileSketch.partials(df, col("sc"), col("v")).collect()
    assert(rows.length <= parts)
    QuantileSketch.merge(
      rows.iterator.map(_.getAs[Array[Byte]]("kll")))
  }

  test("merged partials honor the rank envelope under any partitioning") {
    val data = (1 to 50000).map(i => ((i * 2654435761L) % 100000).toDouble)
    for (parts <- Seq(1, 7, 32)) {
      val sk = mergedOver(data, parts)
      assert(sk.getN === data.size)
      QuantileSketch.quantilesWithBounds(sk, ps).foreach {
        case (p, est, lb, ub) =>
          val r = rankOf(data, est)
          assert(lb <= r && r <= ub,
            s"p=$p parts=$parts: exact rank $r outside [$lb, $ub]")
      }
    }
  }

  test("merge of partials matches a directly-fed sketch's guarantee") {
    val data = (1 to 30000).map(i => math.pow(1.0003, i)) // skewed
    val direct = org.apache.datasketches.kll.KllDoublesSketch
      .newHeapInstance(QuantileSketch.K)
    data.foreach(direct.update)
    val merged = mergedOver(data, 13)
    // identical n and identical published envelope width
    assert(merged.getN === direct.getN)
    ps.foreach { p =>
      assert(math.abs(merged.getRankUpperBound(p) -
        direct.getRankUpperBound(p)) < 1e-12)
      val r = rankOf(data, merged.getQuantile(p,
        org.apache.datasketches.quantilescommon.QuantileSearchCriteria
          .INCLUSIVE))
      assert(merged.getRankLowerBound(p) <= r &&
        r <= merged.getRankUpperBound(p))
    }
  }

  test("serialized partials roundtrip through binary columns") {
    val data = (1 to 5000).map(_.toDouble)
    val sk = mergedOver(data, 4)
    val again = org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(sk.toByteArray))
    assert(again.getN === sk.getN)
    assert(again.getMinItem === 1.0 && again.getMaxItem === 5000.0)
  }

  test("nulls are skipped and scopes kept separate") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", None),
      ("b", Some(10.0))).toDF("sc", "v")
    val rows = QuantileSketch.partials(df, col("sc"), col("v"))
      .as[(String, Array[Byte])].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val a = QuantileSketch.merge(rows("a").iterator)
    val b = QuantileSketch.merge(rows("b").iterator)
    assert(a.getN === 2 && b.getN === 1)
    assert(b.getMaxItem === 10.0)
  }
}
