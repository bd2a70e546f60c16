package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[Fns.ntileFromRank]] (the scale-safe ntile arithmetic behind
  * q_rfm / q_histogram_eqd) against Spark's OWN `ntile` window across the
  * edge cases that break naive bucket formulas: n < k (each row its own
  * bucket), n = k, n = k+1, n % k == 0 (uniform), and ragged sizes. The
  * DuckDB oracles already pin the arithmetic against a second engine at
  * the registered queries' (n, k); this covers the grid. */
class NtileFromRankSpec extends SparkSpec {
  import spark.implicits._

  test("ntileFromRank == ntile(k) over the (n, k) edge grid") {
    val cases = Seq(
      (1, 5), (3, 5), (4, 5), (5, 5), (6, 5), (9, 5), (10, 5), (11, 5),
      (100, 5), (101, 5), (104, 5), (1, 1), (7, 1), (7, 7), (8, 7),
      (500, 10), (503, 10), (2, 3))
    cases.foreach { case (n, k) =>
      val df = spark.range(1, n + 1).toDF("rank")
        .withColumn("nn", lit(n.toLong))
      val got = df
        .withColumn("b", expr(Fns.ntileFromRank("rank", "nn", k)))
        .withColumn("w", ntile(k).over(Window.orderBy($"rank")))
        .filter($"b" =!= $"w")
        .count()
      assert(got == 0L, s"n=$n k=$k: $got mismatching buckets")
    }
  }
}
