package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_approx_percentile has no DuckDB oracle (quantile-sketch internals are
  * engine-specific), so the accuracy contract is asserted here: with
  * accuracy=10000 the returned value's RANK must be within n/10000 of the
  * target rank — checked against the exactly-sorted group. */
class ApproxPercentileSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  test("approx p50 sits within the documented rank-error envelope") {
    val got = SparkEntry.queries("q_approx_percentile")(spark, d)
      .select($"l_returnflag", $"p50_qty")
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
