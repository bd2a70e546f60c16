package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The HLL estimate has no cross-engine twin (Datasketches binaries are
  * engine-specific), so accuracy is asserted HERE against exact counts,
  * while q_hll_distinct hashes the exact counts + its in-query `hll_ok`
  * verdict (the round-8 graduation). This spec rebuilds the same
  * per-scope + union-merged estimates the query computes internally and
  * checks (1) the error envelope, (2) merge-consistency — the property
  * that makes the partials re-aggregatable at 100 TB — and (3) that the
  * query's own verdicts all read true. */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  test("per-scope estimates within 5% of exact; union agrees with direct") {
    val orders = spark.read.parquet(s"$d/orders.parquet")
    val partials = orders.groupBy($"o_orderpriority")
      .agg(hll_sketch_agg($"o_custkey").as("sk"))
    val estPer = partials
      .select($"o_orderpriority", hll_sketch_estimate($"sk"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val estGlobal = partials
      .agg(hll_sketch_estimate(hll_union_agg($"sk")))
      .head().getLong(0).toDouble

    val exactPer = orders.groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactGlobal =
      orders.select(countDistinct($"o_custkey")).head().getLong(0)

    exactPer.foreach { case (scope, exact) =>
      val est = estPer(scope)
      assert(math.abs(est - exact) <= 0.05 * exact,
        s"$scope: est $est vs exact $exact")
    }
    assert(math.abs(estGlobal - exactGlobal) <= 0.05 * exactGlobal)

    // merge-consistency: union of partials tracks one direct global sketch
    // (not exactly equal — the union runs at a different internal register
    // width than a single-pass sketch — but both sit inside the same error
    // envelope, so they must agree to ~1%)
    val direct = orders
      .agg(hll_sketch_estimate(hll_sketch_agg($"o_custkey")))
      .head().getLong(0)
    assert(math.abs(estGlobal - direct) <= 0.01 * direct,
      s"union $estGlobal vs direct $direct")

    // and the query's own hashed verdicts agree
    val verdicts = SparkEntry.queries("q_hll_distinct")(spark, d)
      .select($"hll_ok").as[Boolean].collect()
    assert(verdicts.nonEmpty && verdicts.forall(identity),
      "q_hll_distinct hll_ok must be all-true")
  }
}
