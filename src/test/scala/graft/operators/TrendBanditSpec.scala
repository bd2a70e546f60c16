package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Golden recounts for the round-12 trend/drift/validity family
  * (Jarque-Bera, Ljung-Box, Page-Hinkley, Mann-Kendall, HHI, SRM,
  * UCB1, recall@10). The DuckDB oracle SHARES each query's formula,
  * so a wrong formula would pass both engines — these tests recompute
  * every statistic INDEPENDENTLY (textbook recursions, brute-force
  * pair loops, direct two-pass moments) from the raw sf0.001 rows
  * (the StatTestsSpec / RankSurvSpec pattern). */
class TrendBanditSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  private lazy val dailyCounts: Seq[(String, Long)] =
    graft.Tables.load(spark, d, "events")
      .groupBy(org.apache.spark.sql.functions.to_date($"ts")
        .cast("string").as("day"))
      .count().orderBy($"day")
      .as[(String, Long)].collect().toSeq

  test("q_jarque_bera matches a two-pass central-moment recount") {
    val xs = graft.Tables.load(spark, d, "lineitem")
      .select($"l_quantity").as[Double].collect()
    val n = xs.length.toDouble
    val mean = xs.sum / n
    // two-pass centered moments — a DIFFERENT float path than the
    // query's raw-power-sum expansion
    val m2 = xs.map(x => math.pow(x - mean, 2)).sum / n
    val m3 = xs.map(x => math.pow(x - mean, 3)).sum / n
    val m4 = xs.map(x => math.pow(x - mean, 4)).sum / n
    val skew = m3 / (m2 * math.sqrt(m2))
    val exk = m4 / (m2 * m2) - 3.0
    val jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
    val row = q("q_jarque_bera")
      .as[(Long, Long, Long, Long)].collect().head
    assert(row._1 == xs.length.toLong)
    assert(math.abs(row._2 - math.round(skew * 1e6)) <= 2,
      s"skew ${row._2} vs ${skew * 1e6}")
    assert(math.abs(row._3 - math.round(exk * 1e6)) <= 2,
      s"exkurt ${row._3} vs ${exk * 1e6}")
    assert(math.abs(row._4 - math.round(jb * 1e6)) <= 5,
      s"jb ${row._4} vs ${jb * 1e6}")
  }

  test("q_ljung_box matches a direct gap-correct ACF recount") {
    val byDay = dailyCounts.map { case (day, n) =>
      (java.time.LocalDate.parse(day).toEpochDay, n) }.toMap
    val n = byDay.size.toLong
    val qsum = (1 to 7).map { lag =>
      val pairs = byDay.toSeq.flatMap { case (ep, x) =>
        byDay.get(ep + lag).map(y => (x.toDouble, y.toDouble)) }
      val k = pairs.length.toDouble
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val r = (k * sxy - sx * sy) /
        (math.sqrt(k * sxx - sx * sx) * math.sqrt(k * syy - sy * sy))
      r * r / (n - lag).toDouble
    }.sum
    val lb = n * (n + 2) * qsum
    val row = q("q_ljung_box")
      .as[(Long, Long, Long, Boolean)].collect().head
    assert(row._1 == n && row._2 == 7L)
    assert(math.abs(row._3 - math.round(lb * 1e6)) <= 10,
      s"Q ${row._3} vs ${lb * 1e6}")
    assert(row._4 == (row._3 > 14067140L))
  }

  test("q_page_hinkley matches the textbook running-mean recursion") {
    // recursion with the SAME micro-frozen per-day terms — integer
    // equality, the q_cusum recount contract
    val n = dailyCounts.length
    val mu = dailyCounts.map(_._2).sum.toDouble / n
    val sg = math.sqrt(
      dailyCounts.map(r => BigInt(r._2) * BigInt(r._2)).sum.toDouble / n
        - mu * mu)
    var cum = 0L; var t = 0L; var m = 0L; var mn = Long.MaxValue
    val hm = math.round(4.0 * sg * 1e6)
    val expected = dailyCounts.map { case (day, x) =>
      cum += x; t += 1
      m += math.round((x.toDouble - cum.toDouble / t - 0.5 * sg) * 1e6)
      mn = math.min(mn, m)
      (day, x, m - mn, m - mn > hm)
    }
    val got = q("q_page_hinkley")
      .select($"day".cast("string"), $"x", $"ph_micro", $"alarm")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == expected, s"first diff: ${
      got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("q_mann_kendall matches a brute-force sign-pair loop") {
    val weekly = graft.Tables.load(spark, d, "orders")
      .select(org.apache.spark.sql.functions
        .date_trunc("week", $"o_orderdate").cast("date").as("wk"),
        $"o_totalprice")
      .as[(java.sql.Date, Double)].collect()
      .groupBy(_._1).toSeq
      .map { case (wk, g) =>
        (wk.toLocalDate.toEpochDay,
          g.map(r => math.round(r._2 * 100)).sum) }
      .sortBy(_._1)
    var s = 0L
    for (i <- weekly.indices; j <- weekly.indices if j > i)
      s += java.lang.Long.signum(weekly(j)._2 - weekly(i)._2)
    val n = weekly.length.toLong
    val tt = weekly.groupBy(_._2).values
      .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) })
      .sum
    val var18 = n * (n - 1) * (2 * n + 5) - tt
    val z =
      if (s > 0) (s - 1).toDouble / math.sqrt(var18.toDouble / 18.0)
      else if (s < 0) (s + 1).toDouble / math.sqrt(var18.toDouble / 18.0)
      else 0.0
    val row = q("q_mann_kendall")
      .as[(Long, Long, Long, Long)].collect().head
    assert(row == ((n, s, var18, math.round(z * 1e6))) ||
      math.abs(row._4 - math.round(z * 1e6)) <= 1,
      s"query $row vs recount ($n, $s, $var18, ${math.round(z * 1e6)})")
  }

  test("q_hhi matches a direct share-squared recount") {
    val cust = graft.Tables.load(spark, d, "customer")
      .select($"c_custkey", $"c_nationkey")
      .as[(Long, Long)].collect().toMap
    val nation = graft.Tables.load(spark, d, "nation")
      .select($"n_nationkey", $"n_name")
      .as[(Long, String)].collect().toMap
    val rev = graft.Tables.load(spark, d, "orders")
      .select($"o_custkey", $"o_totalprice")
      .as[(Long, Double)].collect()
      .groupBy(_._1).map { case (ck, g) =>
        (ck, g.map(r => math.round(r._2 * 100)).sum) }
    val expected = rev.toSeq.groupBy { case (ck, _) => cust(ck) }
      .map { case (nk, g) =>
        val sx = g.map(r => BigInt(r._2)).sum
        val sxx = g.map(r => BigInt(r._2) * BigInt(r._2)).sum
        (nation(nk), g.size.toLong,
          math.round(sxx.toDouble / (sx.toDouble * sx.toDouble) * 1e6))
      }.toSeq.sortBy(_._1)
    val got = q("q_hhi")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("q_srm matches exact distinct-arm counts and the integer fence") {
    val users = graft.Tables.load(spark, d, "events")
      .select($"user_id").distinct().as[Long].collect()
    val n0 = users.count(_ % 2 == 0).toLong
    val n1 = users.count(_ % 2 == 1).toLong
    val chi2 = (n0 - n1).toDouble * (n0 - n1) / (n0 + n1)
    val row = q("q_srm")
      .as[(Long, Long, Long, Boolean)].collect().head
    assert(row._1 == n0 && row._2 == n1)
    assert(row._3 == math.round(chi2 * 1e6),
      s"chi2 ${row._3} vs ${chi2 * 1e6}")
    assert(row._4 ==
      (BigInt(n0 - n1) * BigInt(n0 - n1) * 1000000 >
        BigInt(n0 + n1) * 3841459))
  }

  test("q_ucb matches a direct normalized-reward recount") {
    val ev = graft.Tables.load(spark, d, "events")
      .filter($"value".isNotNull)
      .select($"event_type", $"value")
      .as[(String, Double)].collect()
    val mn = ev.map(_._2).min; val mx = ev.map(_._2).max
    val nt = ev.length.toDouble
    val ln9 = math.round(math.log(nt) * 1e9) / 1e9
    val expected = ev.groupBy(_._1).toSeq.map { case (tp, g) =>
      val n = g.length.toLong
      val s6 = g.map(r => math.round((r._2 - mn) / (mx - mn) * 1e6)).sum
      (tp, n, math.round(s6.toDouble / n),
        math.round(s6.toDouble / n + math.sqrt(2.0 * ln9 / n) * 1e6))
    }.sortBy(_._1)
    val got = q("q_ucb")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == expected.map(_._1))
    got.zip(expected).foreach { case (g, e) =>
      assert(g._2 == e._2 && math.abs(g._3 - e._3) <= 1 &&
        math.abs(g._4 - e._4) <= 1, s"arm $g vs $e")
    }
  }

  test("q_cuped matches a direct per-user covariate recount") {
    val ev = graft.Tables.load(spark, d, "events")
      .filter($"value".isNotNull)
      .select($"user_id", org.apache.spark.sql.functions
        .to_date($"ts").cast("string").as("day"), $"value")
      .as[(Long, String, Double)].collect()
    val cut = java.time.LocalDate.parse("2024-01-01").plusDays(15)
    val users = ev.groupBy(_._1).toSeq.flatMap { case (uid, g) =>
      val (pre, post) = g.partition(r =>
        java.time.LocalDate.parse(r._2).isBefore(cut))
      if (pre.isEmpty || post.isEmpty) None
      else {
        def m6(rs: Seq[(Long, String, Double)]): Long = math.round(
          rs.map(r => math.round(r._3 * 1e6)).sum.toDouble / rs.length)
        Some((uid % 2, m6(pre.toSeq), m6(post.toSeq)))
      }
    }
    val n = users.length.toLong
    val nt = users.count(_._1 == 1L).toLong
    val sx = users.map(u => BigInt(u._2)).sum
    val sy = users.map(u => BigInt(u._3)).sum
    val sxx = users.map(u => BigInt(u._2) * BigInt(u._2)).sum
    val sxy = users.map(u => BigInt(u._2) * BigInt(u._3)).sum
    val syy = users.map(u => BigInt(u._3) * BigInt(u._3)).sum
    val theta = (sxy.toDouble * n - sx.toDouble * sy.toDouble) /
      (sxx.toDouble * n - sx.toDouble * sx.toDouble)
    def diff(tSel: ((Long, Long, Long)) => Long): Double = {
      val t = users.filter(_._1 == 1L).map(tSel)
      val c = users.filter(_._1 == 0L).map(tSel)
      t.sum.toDouble / t.length - c.sum.toDouble / c.length
    }
    val rawDiff = diff(_._3)
    val adjDiff = rawDiff - theta * diff(_._2)
    val vr = math.pow(sxy.toDouble * n - sx.toDouble * sy.toDouble, 2) /
      ((sxx.toDouble * n - sx.toDouble * sx.toDouble) *
        (syy.toDouble * n - sy.toDouble * sy.toDouble))
    val row = q("q_cuped")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(row._1 == n && row._2 == nt)
    assert(math.abs(row._3 - math.round(theta * 1e6)) <= 1,
      s"theta ${row._3} vs ${theta * 1e6}")
    assert(math.abs(row._4 - math.round(adjDiff)) <= 2,
      s"adj ${row._4} vs $adjDiff")
    assert(math.abs(row._5 - math.round(rawDiff)) <= 2,
      s"raw ${row._5} vs $rawDiff")
    assert(math.abs(row._6 - math.round(vr * 1e6)) <= 2,
      s"vr ${row._6} vs ${vr * 1e6}")
  }

  test("q_power_mde matches a direct per-arm variance recount") {
    val ev = graft.Tables.load(spark, d, "events")
      .filter($"value".isNotNull)
      .select($"user_id", $"value")
      .as[(Long, Double)].collect()
    def arm(a: Long) = ev.filter(_._1 % 2 == a).map(_._2)
    val (c, t) = (arm(0L), arm(1L))
    def varOf(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    val se = math.sqrt(varOf(c) / c.length + varOf(t) / t.length)
    val mde = 2.801586 * se
    val rel = mde / (c.sum / c.length)
    val row = q("q_power_mde")
      .as[(Long, Long, Long, Long)].collect().head
    assert(row._1 == c.length.toLong && row._2 == t.length.toLong)
    assert(math.abs(row._3 - math.round(mde * 1e6)) <= 2,
      s"mde ${row._3} vs ${mde * 1e6}")
    assert(math.abs(row._4 - math.round(rel * 1e6)) <= 2,
      s"rel ${row._4} vs ${rel * 1e6}")
  }

  test("q_recall_at_k matches a direct top-10 recount and keeps the " +
    "panel contract (8 rows, zero-pool probes present)") {
    // cosines come from the query's own codegen expression (that
    // contract is q_similarity's); the recount exercises the recall
    // composition — ranks, pool size, panel-driven zero rows
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val probes = e.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"label".as("q_label"),
        $"embedding".as("q_emb"))
    val scored = e.filter($"vec_id" >= 8)
      .crossJoin(org.apache.spark.sql.functions.broadcast(probes))
      .select($"q_id", $"q_label", $"vec_id", $"label",
        org.apache.spark.sql.functions
          .expr("cosine_sim(embedding, q_emb)").as("cos"))
      .as[(Long, Int, Long, Int, Double)].collect()
    val expected = scored.groupBy(_._1).toSeq.map { case (qid, rs) =>
      val qlabel = rs.head._2
      val rTot = rs.count(_._4 == qlabel).toLong
      val top = rs.sortBy(r => (-r._5, r._3)).take(10)
      val hits = top.count(_._4 == qlabel).toLong
      val rec = if (rTot == 0L) 0L
        else math.round(hits.toDouble / rTot * 1e6)
      (qid, rTot, hits, rec)
    }.sortBy(_._1)
    val got = q("q_recall_at_k")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.length == 8, s"panel contract broken: ${got.length} rows")
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }
}
