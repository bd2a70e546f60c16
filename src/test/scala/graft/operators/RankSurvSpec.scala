package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Golden recounts for the round-11 rank/survival family. The DuckDB
  * oracle SHARES each query's formula, so a wrong formula would pass
  * both engines — these tests recompute every statistic INDEPENDENTLY
  * (brute-force pair loops, direct per-row ranking, a hand-rolled KM
  * fold) from the raw sf0.001 rows (the StatTestsSpec pattern). */
class RankSurvSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  test("q_kendall_tau matches the brute-force O(n^2) pair count") {
    val rows = graft.Tables.load(spark, d, "lineitem")
      .select($"l_quantity", $"l_discount")
      .as[(Double, Double)].collect()
    var conc = 0L; var disc = 0L
    var i = 0
    while (i < rows.length) {
      var j = i + 1
      while (j < rows.length) {
        val dx = java.lang.Double.compare(rows(i)._1, rows(j)._1)
        val dy = java.lang.Double.compare(rows(i)._2, rows(j)._2)
        if (dx * dy > 0) conc += 1
        else if (dx * dy < 0) disc += 1
        j += 1
      }
      i += 1
    }
    val n = rows.length.toLong
    val n0 = n * (n - 1) / 2
    val n1 = rows.groupBy(_._1).values
      .map(g => g.length.toLong * (g.length - 1) / 2).sum
    val n2 = rows.groupBy(_._2).values
      .map(g => g.length.toLong * (g.length - 1) / 2).sum
    val tau = (conc - disc).toDouble /
      math.sqrt((n0 - n1).toDouble * (n0 - n2).toDouble)

    val row = q("q_kendall_tau")
      .selectExpr("n", "CAST(conc AS BIGINT)", "CAST(disc AS BIGINT)",
        "tau_micro")
      .as[(Long, Long, Long, Long)].collect().head
    assert(row._1 == n)
    assert(row._2 == conc, s"concordant ${row._2} vs direct $conc")
    assert(row._3 == disc, s"discordant ${row._3} vs direct $disc")
    assert(math.abs(row._4 / 1e6 - tau) < 1e-4,
      s"tau ${row._4 / 1e6} vs direct $tau")
  }

  test("q_kruskal_wallis matches per-row average ranks assigned directly") {
    val rows = graft.Tables.load(spark, d, "lineitem")
      .select($"l_returnflag", $"l_quantity")
      .as[(String, Double)].collect()
    val sorted = rows.sortBy(_._2)
    val ranks = new Array[Double](sorted.length)
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._2 == sorted(i)._2) j += 1
      val avg = (i + 1 + j).toDouble / 2.0
      (i until j).foreach(x => ranks(x) = avg)
      i = j
    }
    val n = rows.length.toDouble
    val byFlag = sorted.zip(ranks).groupBy(_._1._1)
    val sumTerm = Seq("A", "N", "R").map { f =>
      val g = byFlag(f)
      val r = g.map(_._2).sum
      r * r / g.length
    }.sum
    val h = 12.0 / (n * (n + 1)) * sumTerm - 3.0 * (n + 1)
    val ties = sorted.groupBy(_._2).values
      .map(g => { val t = g.length.toDouble; t * t * t - t }).sum
    val hc = h / (1.0 - ties / (n * n * n - n))

    val row = q("q_kruskal_wallis")
      .select($"n", $"h_micro").as[(Long, Long)].collect().head
    assert(row._1 == rows.length.toLong)
    assert(math.abs(row._2 / 1e6 - hc) < 1e-3,
      s"H ${row._2 / 1e6} vs direct $hc")
  }

  test("q_kaplan_meier matches a hand-rolled product-limit fold") {
    val perUser = graft.Tables.load(spark, d, "events")
      .selectExpr("user_id",
        "datediff(to_date(ts), '2024-01-01') AS day",
        "event_type = 'purchase' AND value > 100.0 AS q")
      .as[(Long, Int, Boolean)].collect()
      // .toSeq BEFORE .map: a Map mapped to pair tuples re-forms a Map
      // keyed on the first element and silently DEDUPLICATES users
      .groupBy(_._1).toSeq.map { case (_, evs) =>
        val fd = evs.map(_._2).min
        val ld = evs.map(_._2).max
        val dd = evs.filter(_._3).map(_._2).sorted.headOption
        (dd.getOrElse(ld) - fd, dd.isDefined)
      }
    val days = perUser.groupBy(_._1).toSeq.map { case (day, us) =>
      (day, us.count(_._2).toLong, us.length.toLong)
    }.sortBy(_._1)
    // at-risk at duration d = users whose duration >= d
    val atRisk = days.map { case (day, _, _) =>
      day -> perUser.count(_._1 >= day).toLong
    }.toMap
    var s = 1.0
    val km = days.map { case (day, deaths, _) =>
      s = s * (1.0 - deaths.toDouble / atRisk(day))
      (day, atRisk(day), deaths, s)
    }

    val got = q("q_kaplan_meier")
      .select($"day", $"at_risk", $"deaths", $"surv_micro")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) ==
      km.map(r => (r._1, r._2, r._3)),
      s"risk table mismatch: got=${got.take(3)} want=${km.take(3)}")
    got.zip(km).foreach { case (g, w) =>
      assert(math.abs(g._4 / 1e6 - w._4) < 1e-4,
        s"day ${g._1}: surv ${g._4 / 1e6} vs direct ${w._4}")
    }
    // both classes must bind for the pin to mean anything
    assert(got.map(_._3).sum > 0, "no deaths — curve degenerate")
    assert(got.map(_._3).sum < perUser.length, "no censored users")
  }

  test("q_friedman matches directly-ranked complete blocks") {
    val sums = graft.Tables.load(spark, d, "events")
      .filter($"event_type".isin("click", "view", "error"))
      .select($"user_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
      .groupBy(r => (r._1, r._2)).toSeq
      .map { case ((u, t), rs) =>
        (u, t, rs.map(r => BigDecimal(r._3).setScale(6)).sum)
      }
    val blocks = sums.groupBy(_._1).toSeq
      .filter(_._2.map(_._2).toSet.size == 3)
    val rj = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    blocks.foreach { case (_, rows) =>
      rows.sortBy(r => (r._3, r._2)).zipWithIndex.foreach {
        case ((_, t, _), i) => rj(t) += (i + 1).toLong
      }
    }
    val n = blocks.length.toDouble
    val chi2 = Seq("click", "view", "error")
      .map(t => rj(t).toDouble * rj(t)).sum / n - 12.0 * n

    val row = q("q_friedman")
      .select($"n_blocks", $"r1", $"r2", $"r3", $"chi2_micro")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(row._1 == blocks.length.toLong)
    assert((row._2, row._3, row._4) ==
      (rj("click"), rj("view"), rj("error")),
      s"rank sums ${(row._2, row._3, row._4)} vs " +
        s"${(rj("click"), rj("view"), rj("error"))}")
    assert(math.abs(row._5 / 1e6 - chi2) < 1e-3,
      s"chi2 ${row._5 / 1e6} vs direct $chi2")
  }

  test("q_mrr matches sort-based first-relevant ranks") {
    val vecs = graft.Tables.load(spark, d, "embeddings")
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val cands = vecs.filter(_._1 >= 8)
    val rrs = vecs.filter(_._1 < 8).flatMap { case (_, ql, qe) =>
      val scored = cands.map(c => (cos(qe, c._3), c._2))
        .sortBy(-_._1)
      val firstRel = scored.indexWhere(_._2 == ql)
      if (firstRel < 0) None
      else Some(math.round(1e6 / (firstRel + 1)).toLong)
    }
    val mrr = math.round(rrs.sum.toDouble / rrs.length)

    val row = q("q_mrr").select($"n_probes", $"mrr_micro")
      .as[(Long, Long)].collect().head
    assert(row._1 == rrs.length.toLong)
    assert(math.abs(row._2 - mrr) <= 1,
      s"mrr ${row._2} vs direct $mrr")
  }

  test("q_t_closeness matches exact-rational per-class TVD") {
    val rows = graft.Tables.load(spark, d, "customer")
      .selectExpr("c_nationkey", "c_mktsegment",
        "CAST(floor(c_acctbal / 1000) AS BIGINT) AS band")
      .as[(Int, String, Long)].collect()
    val nn = BigInt(rows.length)
    val byBand = rows.groupBy(_._3).map { case (b, rs) =>
      b -> BigInt(rs.length)
    }
    val want = rows.groupBy(r => (r._1, r._2)).toSeq
      .map { case ((nk, seg), rs) =>
        val nC = BigInt(rs.length)
        val cb = rs.groupBy(_._3).map { case (b, g) =>
          b -> BigInt(g.length)
        }
        // .toSeq BEFORE .map: Set#map deduplicates equal |...| terms
        val num = byBand.keys.toSeq.map { b =>
          (cb.getOrElse(b, BigInt(0)) * nn - byBand(b) * nC).abs
        }.sum
        val t = math.round(num.toDouble /
          (2.0 * nC.toDouble * nn.toDouble) * 1e6)
        (nk, seg, rs.length.toLong, t)
      }
      .sortBy(r => (-r._4, r._1.toLong, r._2)).take(10)

    val got = q("q_t_closeness")
      .select($"c_nationkey", $"c_mktsegment", $"n", $"t_micro")
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(got == want, s"got=${got.take(3)} want=${want.take(3)}")
  }
}
