package graft.plans

import graft.SparkSpec
import graft.operators.AsOf
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The native as-of operator (AsOfJoinNode -> AsOfJoinStrategy ->
  * AsOfJoinExec) must agree row-for-row with the built-ins-only
  * formulation [[AsOf.asofJoin]] — which is itself pinned by the
  * q_asof_join DuckDB oracle — and must plan as a single merge operator
  * over co-partitioned sorted children (no window, no union). */
class AsOfJoinExecSpec extends SparkSpec {
  import spark.implicits._

  private def randomInputs(seed: Long) = {
    val rnd = new scala.util.Random(seed)
    // keys 0..19; left-only and right-only keys included by construction
    val left = (1 to 400).map { i =>
      (i.toLong, rnd.nextInt(16).toLong, rnd.nextInt(1000).toLong)
    }.toDF("l_id", "k", "t")
    // distinct (k, rt) pairs: at equal times the compositional window's
    // tie-break among right rows is undefined, which is a property of the
    // BASELINE, not of the operator under test
    val right = rnd.shuffle((1 to 600).map { i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, s"p$i")
    }.distinctBy(r => (r._1, r._2)).toList)
      .toDF("k", "rt", "payload")
    (left, right)
  }

  test("parity with the compositional as-of join on random inputs") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val (left, right) = randomInputs(seed)
      val expected = AsOf
        .asofJoin(left, right, "k", "t", "rt", Seq("payload"))
        .select($"l_id", $"payload").collect().map(r => (r.getLong(0),
          Option(r.getString(1)))).toMap
      val got = AsOf
        .asofJoinNative(left, right, "k", "t", "rt", Seq("payload"))
        .select($"l_id", $"payload").collect().map(r => (r.getLong(0),
          Option(r.getString(1)))).toMap
      assert(got.size == expected.size, s"seed $seed row count")
      assert(got == expected, s"seed $seed")
    }
  }

  test("plans as AsOfJoinExec with no window/union in the subtree") {
    val (left, right) = randomInputs(3L)
    val df = AsOf.asofJoinNative(left, right, "k", "t", "rt", Seq("payload"))
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE wraps stages whose inner plans are not `children` — flatten
    // through QueryStageExec.plan to see the whole physical tree
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children ++ inner).flatMap(flatten)
    }
    val all = flatten(plan)
    assert(all.exists(_.isInstanceOf[AsOfJoinExec]), plan.toString)
    assert(!all.exists(_.getClass.getSimpleName.contains("Window")),
      "native path must not fall back to the window formulation")
    // both children arrive sorted by (key, time) — the exec itself adds no
    // sort, EnsureRequirements placed them
    val exec = all.collectFirst { case e: AsOfJoinExec => e }.get
    assert(exec.children.forall(c =>
      flatten(c).exists(_.getClass.getSimpleName == "SortExec")),
      "EnsureRequirements must have placed a sort under each side")
  }

  test("empty right side yields all-null payload; ties are inclusive") {
    val left = Seq((1L, 1L, 100L), (2L, 1L, 200L)).toDF("l_id", "k", "t")
    val empty = Seq.empty[(Long, Long, String)].toDF("k", "rt", "payload")
    val nulls = AsOf
      .asofJoinNative(left, empty, "k", "t", "rt", Seq("payload"))
      .select($"payload").collect()
    assert(nulls.length == 2 && nulls.forall(_.isNullAt(0)))

    val right = Seq((1L, 100L, "at"), (1L, 150L, "mid")).toDF("k", "rt", "payload")
    val got = AsOf
      .asofJoinNative(left, right, "k", "t", "rt", Seq("payload"))
      .select($"l_id", $"payload").as[(Long, String)].collect().toMap
    assert(got(1L) == "at", "rightTime == leftTime must match (inclusive)")
    assert(got(2L) == "mid")
  }

  test("multi-column payload and long key groups keep O(1) state correct") {
    // one key, many right rows: every left row matches the latest right
    // row at-or-before it; also exercises a two-column payload
    val left = (1 to 50).map(i => (i.toLong, 7L, i * 10L))
      .toDF("l_id", "k", "t")
    val right = (0 to 49).map(i => (7L, i * 10L + 5L, s"v$i", i.toLong))
      .toDF("k", "rt", "name", "num")
    val got = AsOf
      .asofJoinNative(left, right, "k", "t", "rt", Seq("name", "num"))
      .select($"l_id", $"name", $"num").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    // left t=10*i matches right rt=10*(i-1)+5, i.e. (v_{i-1}, i-1)
    got.foreach { case (id, name, num) =>
      assert(name == s"v${id - 1}", s"row $id got $name")
      assert(num == id - 1)
    }
  }
}
