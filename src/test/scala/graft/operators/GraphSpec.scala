package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PageRank golden tests vs an independent in-memory implementation. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def referencePageRank(
      edges: Seq[(String, String)], iterations: Int, damping: Double,
      redistributeDangling: Boolean = false)
      : Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val in = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iterations) {
      val dangling =
        if (redistributeDangling)
          nodes.filterNot(out.contains).map(r).sum
        else 0.0
      r = nodes.map { v =>
        val mass = in.getOrElse(v, Seq.empty)
          .map(u => r(u) / out(u)).sum
        v -> ((1.0 - damping) / n + damping * (mass + dangling / n))
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

  test("dangling-mass redistribution matches the reference and conserves mass") {
    // e is a sink: without redistribution its incoming mass evaporates;
    // with it, total rank stays ~1 every round.
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "a"),
      ("a", "d"), ("b", "d"), ("c", "d"), ("d", "e"))
    val got = Graph.pageRank(edges.toDF("src", "dst"), iterations = 10,
        redistributeDangling = true)
      .as[(String, Double)].collect().toMap
    val want = referencePageRank(edges, 10, 0.85, redistributeDangling = true)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-12, s"node $k: $v vs ${want(k)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9,
      s"mass not conserved: ${got.values.sum}")
    // and the drop-mass variant does NOT conserve it on this sink graph
    val dropped = Graph.pageRank(edges.toDF("src", "dst"), iterations = 10)
      .as[(String, Double)].collect().toMap
    assert(dropped.values.sum < 0.999)
  }

  test("convergence stop yields the fixed point early") {
    // A tight cycle converges fast; a generous iteration cap with tol set
    // must land on (numerically) the same ranks as running the cap out.
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
    val full = Graph.pageRank(edges.toDF("src", "dst"), iterations = 60)
      .as[(String, Double)].collect().toMap
    val early = Graph.pageRank(edges.toDF("src", "dst"), iterations = 60,
        tol = Some(1e-9))
      .as[(String, Double)].collect().toMap
    full.foreach { case (k, v) =>
      assert(math.abs(v - early(k)) < 1e-7, s"node $k: $v vs ${early(k)}")
    }
  }

  test("checkpoint interval does not change results") {
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("d", "b"))
    val every = Graph.pageRank(edges.toDF("src", "dst"), iterations = 7,
        checkpointInterval = 1)
      .as[(String, Double)].collect().toMap
    val sparse = Graph.pageRank(edges.toDF("src", "dst"), iterations = 7,
        checkpointInterval = 5)
      .as[(String, Double)].collect().toMap
    every.foreach { case (k, v) =>
      assert(math.abs(v - sparse(k)) < 1e-12, s"node $k")
    }
  }

  /** In-memory twin of deterministic (integer-nano) pageRank: every
    * step is Long floor division, so equality below is EXACT. */
  private def referencePageRankNano(
      edges: Seq[(String, String)], iterations: Int, d100: Long)
      : Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toLong
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val in = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var r = nodes.map(_ -> 1000000000L / n).toMap
    for (_ <- 1 to iterations)
      r = nodes.map { v =>
        val mass = in.getOrElse(v, Seq.empty).map(u => r(u) / out(u)).sum
        v -> ((100L - d100) * 10000000L / n + d100 * mass / 100L)
      }.toMap
    r
  }

  test("deterministic mode: EXACT integer match to the in-memory twin, " +
      "checkpoint-interval invariant, and close to double mode") {
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "a"),
      ("a", "d"), ("b", "d"), ("c", "d"), ("d", "e"))
    val got = Graph.pageRank(edges.toDF("src", "dst"), iterations = 10,
        deterministic = true)
      .as[(String, Long)].collect().toMap
    assert(got == referencePageRankNano(edges, 10, 85L))
    // quantization is sub-ppm of total mass: nano ranks track the raw
    // double ranks to ~deg*1e-9
    val dbl = referencePageRank(edges, 10, 0.85)
    got.foreach { case (k, v) =>
      assert(math.abs(v / 1e9 - dbl(k)) < 1e-7, s"node $k: $v vs ${dbl(k)}")
    }
    val sparse = Graph.pageRank(edges.toDF("src", "dst"), iterations = 10,
        checkpointInterval = 7, deterministic = true)
      .as[(String, Long)].collect().toMap
    assert(sparse == got)
    // randomized graphs: exact integer agreement, every trial
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val nodes = ('a' to 'l').map(_.toString)
      val e2 = (1 to 30).map(_ =>
        (nodes(rnd.nextInt(nodes.size)), nodes(rnd.nextInt(nodes.size))))
        .filter(e => e._1 != e._2).distinct
      val g2 = Graph.pageRank(e2.toDF("src", "dst"), iterations = 6,
          deterministic = true)
        .as[(String, Long)].collect().toMap
      assert(g2 == referencePageRankNano(e2, 6, 85L), s"trial $trial")
    }
  }

  // The three round-8 link-analysis queries are DETERMINISTIC and fully
  // oracle-checked against DuckDB (unlike 10-round pagerank); these pins
  // assert the semantic invariants a hash match alone doesn't explain.
  private val d001 = "/root/testdata/sf0.001"

  test("labelProp matches a local reference on randomized graphs, " +
      "including bounded-round partial convergence") {
    def localLabelProp(edges: Seq[(String, String)], rounds: Int)
        : Map[String, String] = {
      val adj = (edges ++ edges.map(_.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lbl = adj.keySet.map(v => v -> v).toMap
      for (_ <- 1 to rounds)
        lbl = lbl.map { case (v, l) =>
          v -> (adj(v).map(lbl) :+ l).min
        }
      lbl
    }
    val rnd = new scala.util.Random(7)
    (1 to 4).foreach { trial =>
      val n = 12 + rnd.nextInt(8)
      val edges = (1 to n).map { _ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val rounds = 1 + rnd.nextInt(4) // includes NOT-yet-converged runs
        val got = Graph.labelProp(edges.toDF("src", "dst"), rounds)
          .as[(String, String)].collect().toMap
        val want = localLabelProp(edges, rounds)
        assert(got == want, s"trial $trial rounds $rounds:\n" +
          s"edges=$edges\ngot=$got\nwant=$want")
      }
    }
    // a path graph longer than 2*rounds must NOT have fully converged
    // (pins that `rounds` genuinely bounds label travel distance)
    val chain = (0 until 9).map(i => (f"n$i%02d", f"n${i + 1}%02d"))
    val partial = Graph.labelProp(chain.toDF("src", "dst"), rounds = 2)
      .as[(String, String)].collect().toMap
    assert(partial("n09") == "n07", // label moved exactly 2 hops
      s"expected bounded travel, got ${partial("n09")}")
    val full = Graph.labelProp(chain.toDF("src", "dst"), rounds = 10)
      .as[(String, String)].collect().toMap
    assert(full.values.toSet == Set("n00"), s"chain must converge: $full")
  }

  test("q_label_prop: labels are node ids, sizes positive, order pinned") {
    val rows = graft.SparkEntry.queries("q_label_prop")(spark, d001)
      .as[(String, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (comp, n) =>
      assert(comp.matches("^[cs]\\d+$"), s"label $comp not a node id")
      assert(n >= 1)
    }
    // a min-label component is led by a 'c' id ('c...' < 's...' in every
    // mixed component; bipartite edges mean no component is s-only
    // unless it's a singleton, impossible here since every node has an
    // edge)
    rows.foreach { case (comp, _) =>
      assert(comp.startsWith("c"), s"component label $comp not a min c-id")
    }
    assert(rows.sortBy { case (c, n) => (-n, c) }.toSeq == rows.toSeq)
  }

  test("q_ppr: mass only in the seeds' forward cone; all seeds present") {
    val rows = graft.SparkEntry.queries("q_ppr")(spark, d001)
      .as[(String, Double)].collect()
    val byId = rows.toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, p) =>
      assert(p >= 0, s"$id rank $p")
      assert(id.matches("^[cs]\\d+$"))
    }
    // edges point c->s only, so customers receive NO propagated mass:
    // every customer row must be a seed (c1..c25) holding exactly the
    // teleport share — one identical positive value across all of them
    val custRanks = rows.collect { case (id, p) if id.startsWith("c") =>
      assert(id.drop(1).toLong <= 25, s"non-seed customer $id has mass")
      p
    }
    assert(custRanks.nonEmpty, "no seeds reached the output")
    assert(custRanks.toSet.size == 1 && custRanks.head > 0,
      s"seeds must share the pure teleport share: ${custRanks.toSet}")
    // and some supplier actually received propagated mass
    assert(rows.exists { case (id, p) => id.startsWith("s") && p > 0 })
  }

  test("q_hits: top authorities are suppliers with L2-bounded scores") {
    val rows = graft.SparkEntry.queries("q_hits")(spark, d001)
      .as[(String, Double)].collect()
    // top-20 cut; the sf0.001 graph has only 10 suppliers
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (id, a) =>
      assert(id.startsWith("s"), s"authority $id on a c->s graph")
      assert(a > 0 && a <= 1.0, s"$id authority $a outside (0,1]")
    }
    // sorted by authority desc with id tie-break
    assert(rows.sortBy { case (id, a) => (-a, id) }.toSeq == rows.toSeq)
  }
}
