package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Structural invariants + independent local goldens for the round-7
  * hierarchy-traversal and OLS queries (both oracle-checked; these pin
  * semantics a hash match alone doesn't explain). */
class HierarchyOlsSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  test("q_hierarchy_rollup conserves counts and value at the roots") {
    // every part id <= 20000 reaches a single-digit root in <= 4 hops of
    // parent = id div 10, so the bounded-depth (5) traversal covers the
    // WHOLE table: root subtree counts must partition the part table and
    // subtree values must sum to total retail price (each node counts
    // toward exactly one root).
    val got = SparkEntry.queries("q_hierarchy_rollup")(spark, d)
      .as[(Long, Long, Long)].collect()
    val parts = spark.read.parquet(s"$d/part.parquet")
      .selectExpr("CAST(p_partkey AS BIGINT) AS id",
        "CAST(round(CAST(p_retailprice AS DOUBLE) * 100) AS BIGINT) AS v")
      .as[(Long, Long)].collect()
    assert(got.map(_._2).sum == parts.length,
      s"root descendant counts ${got.map(_._2).sum} != ${parts.length}")
    val totGot = got.map(_._3).sum
    val totAll = parts.map(_._2).sum
    assert(totGot == totAll, s"subtree value $totGot != corpus $totAll")
    // roots are exactly the single-digit ids present
    assert(got.map(_._1).toSet == parts.map(_._1).filter(_ <= 9).toSet)
  }

  test("q_ols_normal matches a local normal-equations solve") {
    val rows = spark.read.parquet(s"$d/lineitem.parquet")
      .selectExpr("CAST(l_quantity AS BIGINT) AS x1",
        "CAST(round(l_discount * 100, 0) AS BIGINT) AS x2",
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y")
      .as[(Long, Long, Long)].collect()
    val n = rows.length.toDouble
    def s(f: ((Long, Long, Long)) => Long): Double = rows.map(f).sum.toDouble
    val (s1, s2, sy) = (s(_._1), s(_._2), s(_._3))
    val (s11, s22, s12) =
      (s(r => r._1 * r._1), s(r => r._2 * r._2), s(r => r._1 * r._2))
    val (s1y, s2y) = (s(r => r._1 * r._3), s(r => r._2 * r._3))
    // Cramer on the 3x3 normal matrix [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val b0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)) / det
    val b1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)) / det
    val b2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)) / det
    val got = SparkEntry.queries("q_ols_normal")(spark, d)
      .selectExpr("b0", "b1", "b2").as[(Double, Double, Double)].head()
    assert(math.abs(got._1 - b0 / 100.0) < 1e-4, s"b0 ${got._1} vs ${b0 / 100}")
    assert(math.abs(got._2 - b1 / 100.0) < 1e-4, s"b1 ${got._2} vs ${b1 / 100}")
    assert(math.abs(got._3 - b2 / 100.0) < 1e-4, s"b2 ${got._3} vs ${b2 / 100}")
    // and the fit is sane: price rises with quantity on this data
    assert(got._2 > 0, s"expected positive quantity slope, got ${got._2}")
  }
}
