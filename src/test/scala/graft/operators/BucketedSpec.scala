package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the bucketed-table contract on live plans: the co-located join
  * of two same-bucketed tables carries NO shuffle exchange, while the
  * plain path-based join of the same data carries them — with
  * row-identical results. */
class BucketedSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("co-bucketed orders x lineitem joins with zero Exchange and " +
      "matches the plain join") {
    val orders = spark.read.parquet(s"$d/orders.parquet")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val lineitem = spark.read.parquet(s"$d/lineitem.parquet")
      .select($"l_orderkey".as("o_orderkey"), $"l_quantity",
        $"l_extendedprice")
    Bucketed.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketed.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    try {
      val joined =
        Bucketed.coLocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")

      // the UNBUCKETED twin of the same plan shape shuffles both sides
      val plain = orders.hint("merge").join(lineitem, "o_orderkey")
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning"),
        s"plain merge join should show the shuffle the buckets remove")

      // identical results, row for row
      val a = joined.orderBy($"o_orderkey", $"l_quantity", $"l_extendedprice")
        .collect().map(_.toSeq)
      val b = plain.orderBy($"o_orderkey", $"l_quantity", $"l_extendedprice")
        .collect().map(_.toSeq)
      assert(a.length == b.length && a.toSeq == b.toSeq,
        s"bucketed=${a.length} plain=${b.length}")

      // bucketed AGGREGATION on the key is also exchange-free: the
      // scan's bucket partitioning satisfies the groupBy distribution
      val agg = spark.table("b_lineitem").groupBy($"o_orderkey")
        .agg(sum($"l_quantity").as("q"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        s"bucketed groupBy must not shuffle:\n$aggPlan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
