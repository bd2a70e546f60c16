package graft.operators

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** The z-order locality invariant: every top-6-bit z-range confines BOTH
  * dimensions to a small fraction of their global span (an 8×8 grid cell
  * ≈ 1/8 each + cell-boundary rounding). A linear sort would pass on one
  * dimension and span ~100% on the other — the assert below would fail. */
class ZOrderSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("q_zorder: every z-bucket spans ≤ 1/4 of BOTH dimensions") {
    import spark.implicits._
    val o = graft.Tables.load(spark, d, "orders")
    val g = o.agg(
      (max($"o_custkey") - min($"o_custkey")).as("ck"),
      datediff(max($"o_orderdate"), min($"o_orderdate")).cast("long")
        .as("dd")).head()
    val (gCk, gDd) = (g.getAs[Long]("ck"), g.getAs[Long]("dd"))
    val rows = SparkEntry.queries("q_zorder")(spark, d).collect()
    assert(rows.length === 64)
    var total = 0L
    rows.foreach { r =>
      total += r.getAs[Long]("n")
      assert(r.getAs[Long]("custkey_span") * 4 <= gCk,
        s"zbucket ${r.getAs[Long]("zbucket")} custkey span too wide")
      assert(r.getAs[Long]("date_span_days") * 4 <= gDd,
        s"zbucket ${r.getAs[Long]("zbucket")} date span too wide")
    }
    assert(total === o.count(), "z-bucketing must partition all rows")
  }
}
