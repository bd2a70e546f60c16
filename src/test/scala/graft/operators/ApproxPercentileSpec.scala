package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_approx_percentile's verified output is the rank-bound envelope (the
  * sketch VALUES are engine-specific, so the DuckDB oracle checks exact
  * counts + all-TRUE envelope booleans); the value-level accuracy
  * contract is asserted here against the exactly-sorted group: with
  * accuracy=10000 the returned value's RANK must be within n/10000 of
  * the target rank. */
class ApproxPercentileSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  test("approx p50 sits within the documented rank-error envelope") {
    // the raw sketch values come from the library expression (the
    // query's verified output carries only the envelope booleans)
    val got = spark.read.parquet(s"$d/lineitem.parquet")
      .groupBy($"l_returnflag")
      .agg(expr("approx_percentile(l_quantity, 0.5, 10000)").as("p50_qty"))
      .as[(String, Double)].collect().toMap

    val li = spark.read.parquet(s"$d/lineitem.parquet")
    got.foreach { case (flag, approx) =>
      val vals = li.filter($"l_returnflag" === flag)
        .select($"l_quantity").as[Double].collect().sorted
      val n = vals.length
      // the returned value must fall between the exact order statistics
      // at ranks n/2 ± n/10000 (a pure rank count misfires on heavily
      // tied columns, where one value legitimately spans many ranks)
      val tol = math.max(n / 10000, 1)
      val lo = vals(math.max(n / 2 - tol - 1, 0))
      val hi = vals(math.min(n / 2 + tol + 1, n - 1))
      assert(approx >= lo && approx <= hi,
        s"$flag: value $approx outside [$lo, $hi] of $n rows")
    }
  }

  test("the query's in-line envelope self-check reports all-ok") {
    val oks = SparkEntry.queries("q_approx_percentile")(spark, d)
      .select($"p50_ok", $"p25_ok", $"p90_ok")
      .as[(Boolean, Boolean, Boolean)].collect()
    assert(oks.nonEmpty && oks.forall(t => t._1 && t._2 && t._3),
      oks.mkString(", "))
  }
}
