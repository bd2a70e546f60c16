package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_hll_distinct has no DuckDB oracle (Datasketches binaries are
  * engine-specific), so accuracy is asserted here: every scope's estimate
  * must land within the sketch's documented error envelope of the exact
  * distinct count, and the union-merged global estimate must agree with a
  * direct global sketch (merge-consistency — the property that makes the
  * partials re-aggregatable at 100 TB). */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  test("per-scope estimates within 5% of exact; union agrees with direct") {
    val got = SparkEntry.queries("q_hll_distinct")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap

    val orders = spark.read.parquet(s"$d/orders.parquet")
    val exactPer = orders.groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactGlobal =
      orders.select(countDistinct($"o_custkey")).head().getLong(0)

    exactPer.foreach { case (scope, exact) =>
      val est = got(scope)
      assert(math.abs(est - exact) <= 0.05 * exact,
        s"$scope: est $est vs exact $exact")
    }
    assert(math.abs(got("_global") - exactGlobal) <= 0.05 * exactGlobal)

    // merge-consistency: union of partials tracks one direct global sketch
    // (not exactly equal — the union runs at a different internal register
    // width than a single-pass sketch — but both sit inside the same error
    // envelope, so they must agree to ~1%)
    val direct = orders
      .agg(hll_sketch_estimate(hll_sketch_agg($"o_custkey")))
      .head().getLong(0)
    assert(math.abs(got("_global") - direct) <= 0.01 * direct,
      s"union ${got("_global")} vs direct $direct")
  }
}
