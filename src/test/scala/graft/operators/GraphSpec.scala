package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PageRank golden tests vs an independent in-memory implementation. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def referencePageRank(
      edges: Seq[(String, String)], iterations: Int, damping: Double)
      : Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val in = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iterations) {
      r = nodes.map { v =>
        val mass = in.getOrElse(v, Seq.empty)
          .map(u => r(u) / out(u)).sum
        v -> ((1.0 - damping) / n + damping * mass)
      }.toMap
    }
    r
  }

  test("ranks match the in-memory reference on a known graph") {
    // a hub (d) fed by everyone, a cycle a->b->c->a, and a sink e
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "a"),
      ("a", "d"), ("b", "d"), ("c", "d"), ("d", "e"))
    val got = Graph.pageRank(edges.toDF("src", "dst"), iterations = 10)
      .as[(String, Double)].collect().toMap
    val want = referencePageRank(edges, 10, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-12, s"node $k: $v vs ${want(k)}")
    }
    // the hub out-ranks cycle members; the pure sink holds the least mass
    // among fed nodes but more than the floor
    assert(got("d") > got("a") && got("d") > got("b"))
    assert(got("e") > (1.0 - 0.85) / 5)
  }

  test("randomized graphs agree with the reference") {
    val rnd = new scala.util.Random(5)
    for (trial <- 1 to 3) {
      val nodes = ('a' to 'j').map(_.toString)
      val edges = (1 to 25).map(_ =>
        (nodes(rnd.nextInt(nodes.size)), nodes(rnd.nextInt(nodes.size))))
        .filter(e => e._1 != e._2).distinct
      val got = Graph.pageRank(edges.toDF("src", "dst"), iterations = 8)
        .as[(String, Double)].collect().toMap
      val want = referencePageRank(edges, 8, 0.85)
      got.foreach { case (k, v) =>
        assert(math.abs(v - want(k)) < 1e-10, s"trial $trial node $k")
      }
    }
  }
}
