package graft.operators

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec}

/** Golden recounts for q_markov_attribution. The DuckDB oracle shares
  * the query's fixed-point structure (both are generated from the same
  * state lists), so these tests verify INDEPENDENTLY: (1) the chain is
  * solved exactly by Gaussian elimination on (I-Q)v = b — a different
  * algorithm than the 64-step iteration — from journey counts rebuilt
  * by a plain-Scala walk; (2) a planted fixture where only one channel
  * ever precedes conversion must hand that channel all the credit. */
class MarkovAttributionSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private val chans = Seq("click", "error", "signup", "view")

  /** Journey transition counts via an independent per-user walk. */
  private def walkCounts(
      rows: Seq[(Long, Long, Long, String)]): Map[(String, String), Long] = {
    val trans = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    rows.groupBy(_._1).values.foreach { ev =>
      val sorted = ev.sortBy(r => (r._2, r._3)).map(_._4)
      val cut = sorted.indexOf("purchase") match {
        case -1 => sorted
        case i => sorted.take(i + 1)
      }
      trans(("start", cut.head)) += 1
      cut.sliding(2).foreach {
        case Seq(a, b) => trans((a, b)) += 1
        case _ =>
      }
      if (cut.last != "purchase") trans((cut.last, "null")) += 1
    }
    trans.toMap
  }

  /** Absorption probability into purchase from start, by exact 4x4
    * Gaussian elimination on (I - Q)v = b. */
  private def solveExact(cnt: Map[(String, String), Long],
      removed: Option[String]): Double = {
    val tos = chans ++ Seq("purchase", "null")
    def tot(f: String) = tos.map(t => cnt.getOrElse((f, t), 0L)).sum
    def p(f: String, t: String): Double = {
      val tf = tot(f)
      if (tf == 0) 0.0 else cnt.getOrElse((f, t), 0L).toDouble / tf
    }
    val live = chans.filterNot(removed.contains)
    val n = live.length
    // A = I - Q over live channels, rhs = p(., purchase)
    val a = Array.tabulate(n, n)((i, j) =>
      (if (i == j) 1.0 else 0.0) - p(live(i), live(j)))
    val b = Array.tabulate(n)(i => p(live(i), "purchase"))
    for (c <- 0 until n) {
      val piv = (c until n).maxBy(r => math.abs(a(r)(c)))
      val (tr, tb) = (a(c), b(c)); a(c) = a(piv); b(c) = b(piv)
      a(piv) = tr; b(piv) = tb
      for (r <- 0 until n if r != c && a(c)(c) != 0.0) {
        val f = a(r)(c) / a(c)(c)
        for (k <- 0 until n) a(r)(k) -= f * a(c)(k)
        b(r) -= f * b(c)
      }
    }
    val v = live.indices.map(i =>
      if (a(i)(i) == 0.0) 0.0 else b(i) / a(i)(i))
    val vm = live.zip(v).toMap
    p("start", "purchase") +
      chans.map(t => p("start", t) * vm.getOrElse(t, 0.0)).sum
  }

  test("fixed point matches an exact Gaussian-elimination solve") {
    val rows = graft.Tables.load(spark, d, "events")
      .select($"user_id",
        org.apache.spark.sql.functions.unix_micros($"ts"),
        $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect().toSeq
    val cnt = walkCounts(rows)
    val v0 = solveExact(cnt, None)
    val res = chans.map(c => c -> (1.0 - solveExact(cnt, Some(c)) / v0))
    val sre = res.map(_._2).sum
    val got = SparkEntry.queries("q_markov_attribution")(spark, d)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == chans)
    got.zip(res).foreach { case (g, (c, re)) =>
      assert(g._1 == c)
      // 64 iterations converge to ~q^64 of the exact solve; the house
      // journey-continuation probability ~0.8 puts that under 2 micro
      assert(math.abs(g._2 - math.round(re * 1e6)) <= 5,
        s"re($c): ${g._2} vs ${re * 1e6}")
      assert(math.abs(g._3 - math.round(re / sre * 1e6)) <= 5,
        s"share($c)")
      assert(math.abs(g._4 - math.round(v0 * 1e6)) <= 5, "p_base")
    }
    // shares are a partition of the credit
    assert(math.abs(got.map(_._3).sum - 1000000L) <= 4)
  }

  test("a channel that never precedes conversion gets zero credit") {
    // u1/u2: click -> purchase; u3/u4: view-only journeys (no purchase)
    val rows = Seq(
      (1L, "2024-01-01 08:00:00", 1L, "click"),
      (1L, "2024-01-01 08:01:00", 2L, "purchase"),
      (2L, "2024-01-01 09:00:00", 3L, "click"),
      (2L, "2024-01-01 09:01:00", 4L, "purchase"),
      (3L, "2024-01-01 10:00:00", 5L, "view"),
      (3L, "2024-01-01 10:01:00", 6L, "view"),
      (4L, "2024-01-01 11:00:00", 7L, "view"))
    val dir = Files.createTempDirectory("graft_markov").toString
    rows.toDF("user_id", "ts_s", "event_id", "event_type")
      .select($"user_id",
        org.apache.spark.sql.functions.to_timestamp($"ts_s").as("ts"),
        $"event_id", $"event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_markov_attribution")(spark, dir)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    val byChan = got.map(g => g._1 -> g).toMap
    assert(byChan("view")._2 == 0L, "view removal effect must be 0")
    assert(byChan("click")._3 == 1000000L, "click takes all credit")
    // base conversion: 2 of 4 journeys convert
    assert(math.abs(byChan("click")._4 - 500000L) <= 1)
  }
}
