package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Golden recounts for the inference family (odds ratio, Cramér's V,
  * Bayesian A/B, mSPRT). The DuckDB oracle SHARES each query's formula,
  * so a wrong formula would pass both engines — these tests recompute
  * every statistic INDEPENDENTLY (plain-Scala cell counts, direct
  * double-path chi-square, a from-scratch grid integration plus an
  * exact closed-form Beta cross-check, a textbook day-loop) from the
  * raw sf0.001 rows. */
class InferenceSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  /** (arm, userId) -> converted, from raw rows. */
  private lazy val userConv: Map[(Long, Long), Boolean] =
    graft.Tables.load(spark, d, "events")
      .select($"user_id", $"event_type")
      .as[(Long, String)].collect()
      .groupBy(r => (((r._1 % 2) + 2) % 2, r._1))
      .map { case (k, rs) => k -> rs.exists(_._2 == "purchase") }

  private lazy val (a0, b0, c0, d0) = {
    val t = userConv.filter(_._1._1 == 1L).values
    val c = userConv.filter(_._1._1 == 0L).values
    (t.count(identity).toLong, t.count(!_).toLong,
      c.count(identity).toLong, c.count(!_).toLong)
  }

  test("q_odds_ratio matches a plain-Scala cell recount") {
    val (a, b, c, dd) = (a0 + 0.5, b0 + 0.5, c0 + 0.5, d0 + 0.5)
    val or = a * dd / (b * c)
    val rr = (a / (a + b)) / (c / (c + dd))
    val lor = math.log(or)
    val se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / dd)
    val row = q("q_odds_ratio")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    assert((row._1, row._2, row._3, row._4) == (a0, b0, c0, d0))
    assert(math.abs(row._5 - math.round(or * 1e6)) <= 2)
    assert(math.abs(row._6 - math.round(rr * 1e6)) <= 2)
    assert(math.abs(row._7 -
      math.round(math.exp(lor - 1.959964 * se) * 1e6)) <= 2)
    assert(math.abs(row._8 -
      math.round(math.exp(lor + 1.959964 * se) * 1e6)) <= 2)
  }

  test("q_cramers_v matches a direct double-path chi-square") {
    val rows = graft.Tables.load(spark, d, "orders")
      .select($"o_orderstatus", $"o_orderpriority")
      .as[(String, String)].collect()
    val n = rows.length.toDouble
    val cells = rows.groupBy(identity).map { case (k, v) =>
      k -> v.length.toDouble }
    val rt = rows.groupBy(_._1).map { case (k, v) =>
      k -> v.length.toDouble }
    val ct = rows.groupBy(_._2).map { case (k, v) =>
      k -> v.length.toDouble }
    // FULL grid incl. empty cells — their expectation still counts
    val chi2 = (for (s <- rt.keys; p <- ct.keys) yield {
      val e = rt(s) * ct(p) / n
      val o = cells.getOrElse((s, p), 0.0)
      (o - e) * (o - e) / e
    }).sum
    val v = math.sqrt(chi2 / (n * (math.min(rt.size, ct.size) - 1)))
    val row = q("q_cramers_v")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(row._1 == rows.length.toLong)
    assert(row._2 == rt.size.toLong && row._3 == ct.size.toLong)
    assert(math.abs(row._4 - math.round(chi2 * 1e6)) <= 20,
      s"chi2 ${row._4} vs ${chi2 * 1e6}")
    assert(math.abs(row._5 - math.round(v * 1e6)) <= 2)
  }

  /** Lanczos log-gamma (g=7, 9 coefficients — standard public-domain
    * constants), used only by the closed-form Beta cross-check. */
  private def lgamma(x: Double): Double = {
    val g = Array(0.99999999999980993, 676.5203681218851,
      -1259.1392167224028, 771.32342877765313, -176.61502916214059,
      12.507343278686905, -0.13857109526572012, 9.9843695780195716e-6,
      1.5056327351493116e-7)
    if (x < 0.5)
      math.log(math.Pi / math.sin(math.Pi * x)) - lgamma(1 - x)
    else {
      val xx = x - 1
      val base = xx + 7.5
      val s = g.zipWithIndex.drop(1)
        .map { case (c, i) => c / (xx + i) }.sum + g(0)
      0.5 * math.log(2 * math.Pi) + (xx + 0.5) * math.log(base) -
        base + math.log(s)
    }
  }

  test("q_bayes_ab: independent grid recount + exact closed form") {
    val nc = userConv.count(_._1._1 == 0L).toLong
    val sc = userConv.count(k => k._1._1 == 0L && k._2).toLong
    val nt = userConv.count(_._1._1 == 1L).toLong
    val st = userConv.count(k => k._1._1 == 1L && k._2).toLong
    // independent midpoint-rule recount (same stated contract, plain
    // Scala arithmetic path)
    val gN = 2048
    def w12(s: Long, n: Long): Array[Long] = {
      val lw = (1 to gN).map { i =>
        val x = (i - 0.5) / gN
        BigDecimal(s * math.log(x) + (n - s) * math.log(1 - x))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val mx = lw.max
      lw.map(l => math.round(math.exp(l - mx) * 1e12)).toArray
    }
    val wc = w12(sc, nc); val wt = w12(st, nt)
    val zc = wc.map(BigInt(_)).sum; val zt = wt.map(BigInt(_)).sum
    val cumc = wc.scanLeft(BigInt(0))(_ + _).tail
    val num = wt.zipWithIndex.map { case (w, i) =>
      BigDecimal(w) * BigDecimal(2 * cumc(i) - wc(i)) }.sum
    val p = (num / (BigDecimal(2) * BigDecimal(zc) * BigDecimal(zt)))
      .toDouble
    val row = q("q_bayes_ab")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert((row._1, row._2, row._3, row._4) == (nc, sc, nt, st))
    assert(math.abs(row._5 - math.round(p * 1e6)) <= 2,
      s"grid p ${row._5} vs ${p * 1e6}")
    // closed form: P(T > C) = sum_{k=0}^{sT} B(aC+k, bC+bT) /
    // ((bT+k) B(1+k, bT) B(aC, bC)) with a=1+s, b=1+n-s
    val (ac, bc) = (1.0 + sc, 1.0 + (nc - sc))
    val (at, bt) = (1.0 + st, 1.0 + (nt - st))
    def lbeta(x: Double, y: Double) = lgamma(x) + lgamma(y) - lgamma(x + y)
    val exact = (0 until at.toInt).map { k =>
      math.exp(lbeta(ac + k, bc + bt) - math.log(bt + k) -
        lbeta(1.0 + k, bt) - lbeta(ac, bc))
    }.sum
    assert(math.abs(row._5 / 1e6 - exact) < 2e-3,
      s"grid ${row._5 / 1e6} vs closed-form $exact")
    assert(row._6 == math.round((1 + sc) / (2.0 + nc) * 1e6))
    assert(row._7 == math.round((1 + st) / (2.0 + nt) * 1e6))
  }

  test("q_msprt matches a textbook day-loop recount") {
    val rows = graft.Tables.load(spark, d, "events")
      .filter($"value".isNotNull)
      .select(org.apache.spark.sql.functions.to_date($"ts")
        .cast("string"), $"user_id" % 2,
        org.apache.spark.sql.functions
          .expr("CAST(round(value * 1000000.0, 0) AS BIGINT)"))
      .as[(String, Long, Long)].collect()
    val n = rows.length
    val s1 = rows.map(r => BigInt(r._3)).sum
    val s2 = rows.map(r => BigInt(r._3) * BigInt(r._3)).sum
    val g = BigDecimal(
      (s2.toDouble / 1e12 - s1.toDouble / 1e6 * s1.toDouble / 1e6 / n)
        / (n - 1)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val days = rows.map(_._1).distinct.sorted
    var (ncc, scc, ntc, stc) = (0L, 0L, 0L, 0L)
    val expect = days.flatMap { day =>
      val dr = rows.filter(_._1 == day)
      val c = dr.filter(_._2 == 0L); val t = dr.filter(_._2 == 1L)
      ncc += c.length; scc += c.map(_._3).sum
      ntc += t.length; stc += t.map(_._3).sum
      // the query inner-joins the per-arm day series: a readout row
      // exists only on days where BOTH arms logged events
      if (c.isEmpty || t.isEmpty) None
      else {
        val mc = scc.toDouble / ncc / 1e6
        val mt = stc.toDouble / ntc / 1e6
        val v = g * (1.0 / ncc + 1.0 / ntc)
        val llam = 0.5 * math.log(v / (v + g)) +
          (mt - mc) * (mt - mc) * g / (2 * v * (v + g))
        Some((day, ncc, ntc, math.round(llam * 1e6)))
      }
    }
    val got = q("q_msprt")
      .select($"day".cast("string"), $"nc", $"nt", $"log_lambda_micro")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (gr, er) =>
      assert(gr._1 == er._1 && gr._2 == er._2 && gr._3 == er._3)
      assert(math.abs(gr._4 - er._4) <= 2, s"day ${gr._1}: ${gr._4} vs ${er._4}")
    }
  }

  /** Daily order revenue in exact cents, from raw rows. */
  private lazy val dailyRev: Map[Long, Long] =
    graft.Tables.load(spark, d, "orders")
      .select(org.apache.spark.sql.functions.to_date($"o_orderdate")
        .cast("string"),
        org.apache.spark.sql.functions
          .expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
      .as[(String, Long)].collect()
      .groupBy(r => java.time.LocalDate.parse(r._1).toEpochDay)
      .map { case (k, v) => k -> v.map(_._2).sum }

  /** Daily event counts keyed by epoch day, from raw rows. */
  private lazy val dailyCnt: Seq[(Long, Long)] =
    graft.Tables.load(spark, d, "events")
      .groupBy(org.apache.spark.sql.functions.to_date($"ts")
        .cast("string").as("day"))
      .count().as[(String, Long)].collect()
      .map(r => (java.time.LocalDate.parse(r._1).toEpochDay, r._2))
      .sortBy(_._1).toSeq

  test("q_forecast_eval matches a plain day-map recount") {
    val e7 = dailyRev.toSeq.flatMap { case (ep, r) =>
      dailyRev.get(ep - 7).map(f => (r, f)) }
    val e1 = dailyRev.toSeq.flatMap { case (ep, r) =>
      dailyRev.get(ep - 1).map(f => (r, f)) }
    val mape = e7.map { case (r, f) =>
      math.round(math.abs(r - f).toDouble / r * 1e6) }.sum.toDouble /
      e7.length
    val smape = e7.map { case (r, f) =>
      math.round(2.0 * math.abs(r - f) / (r + f) * 1e6) }.sum.toDouble /
      e7.length
    val mase = (e7.map { case (r, f) => math.abs(r - f) }.sum.toDouble /
      e7.length) / (e1.map { case (r, f) => math.abs(r - f) }.sum.toDouble /
      e1.length)
    val row = q("q_forecast_eval")
      .as[(Long, Long, Long, Long)].collect().head
    assert(row._1 == e7.length.toLong)
    assert(math.abs(row._2 - math.round(mape)) <= 2)
    assert(math.abs(row._3 - math.round(smape)) <= 2)
    assert(math.abs(row._4 - math.round(mase * 1e6)) <= 2)
  }

  test("q_pinball matches a sorted-array quantile + direct loss; " +
    "each quantile minimizes its own loss") {
    val xs = dailyRev.values.toArray.sorted
    def quant(p: Double): Double = {
      val pos = p * (xs.length - 1)
      val lo = pos.toInt; val frac = pos - lo
      if (lo + 1 < xs.length) xs(lo) + (xs(lo + 1) - xs(lo)) * frac
      else xs(lo).toDouble
    }
    def loss(qv: Double, f1: Long): Double =
      dailyRev.values.map { r =>
        math.round(qv * math.max(r * 10 - f1, 0L) +
          (1 - qv) * math.max(f1 - r * 10, 0L)).toDouble
      }.sum / dailyRev.size
    val rows = q("q_pinball")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val qs = Seq(0.1, 0.5, 0.9)
    rows.zip(qs).foreach { case ((qm, f1, n, avg), p) =>
      assert(qm == math.round(p * 1e6))
      assert(f1 == math.round(quant(p) * 10))
      assert(n == dailyRev.size.toLong)
      assert(math.abs(avg - math.round(loss(p, f1))) <= 2,
        s"q=$p: $avg vs ${loss(p, f1)}")
    }
    // scoring-rule sanity: the q-quantile forecast beats the OTHER two
    // forecasts on its own loss
    for ((p, i) <- qs.zipWithIndex; (f1, j) <- rows.map(_._2).zipWithIndex
         if i != j)
      assert(loss(p, rows(i)._2) <= loss(p, f1) + 1e-9,
        s"quantile $p not the minimizer vs forecast $j")
  }

  test("q_yule_walker matches a direct centered-covariance recount") {
    val byDay = dailyCnt.toMap
    val nd = dailyCnt.length
    val mu = dailyCnt.map(_._2).sum.toDouble / nd
    val c0 = dailyCnt.map { case (_, x) => (x - mu) * (x - mu) }.sum / nd
    def ck(k: Int): Double = {
      val pairs = dailyCnt.flatMap { case (ep, x) =>
        byDay.get(ep + k).map(y => (x - mu) * (y - mu)) }
      pairs.sum / pairs.length
    }
    val r1 = ck(1) / c0; val r2 = ck(2) / c0
    val phi1 = r1 * (1 - r2) / (1 - r1 * r1)
    val phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
    val row = q("q_yule_walker")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(row._1 == nd.toLong)
    assert(math.abs(row._2 - math.round(r1 * 1e6)) <= 2)
    assert(math.abs(row._3 - math.round(r2 * 1e6)) <= 2)
    assert(math.abs(row._4 - math.round(phi1 * 1e6)) <= 5)
    assert(math.abs(row._5 - math.round(phi2 * 1e6)) <= 5)
  }

  test("q_grubbs matches a direct max-z recount") {
    val n = dailyCnt.length
    val mu = dailyCnt.map(_._2).sum.toDouble / n
    val sd = math.sqrt(dailyCnt.map { case (_, x) =>
      (x - mu) * (x - mu) }.sum / (n - 1))
    val (epBest, xBest) = dailyCnt
      .maxBy { case (ep, x) => (math.abs(x * n - dailyCnt.map(_._2).sum), -ep) }
    val g = math.abs(xBest - mu) / sd
    val row = q("q_grubbs")
      .select($"n_days", $"day".cast("string"), $"x", $"g_micro")
      .as[(Long, String, Long, Long)].collect().head
    assert(row._1 == n.toLong)
    assert(java.time.LocalDate.parse(row._2).toEpochDay == epBest)
    assert(row._3 == xBest)
    assert(math.abs(row._4 - math.round(g * 1e6)) <= 2)
  }

  test("q_periodogram matches a direct DFT recount") {
    val d0 = dailyCnt.map(_._1).min
    val powers = (2 to 14).map { k =>
      val a = dailyCnt.map { case (ep, x) =>
        x * math.cos(2 * math.Pi * (ep - d0) / k) }.sum
      val b = dailyCnt.map { case (ep, x) =>
        x * math.sin(2 * math.Pi * (ep - d0) / k) }.sum
      k -> (a * a + b * b)
    }
    val mp = powers.map(_._2).max
    val p6 = powers.map { case (k, p) => k -> math.round(p / mp * 1e6) }
    val tp = p6.map(_._2).sum.toDouble
    val rows = q("q_periodogram")
      .as[(Int, Long, Boolean)].collect().sortBy(_._1)
    assert(rows.length == 13)
    rows.zip(p6).foreach { case ((k, share, peak), (ek, ep6)) =>
      assert(k == ek)
      // the recount's unfrozen trig path drifts slightly from the
      // query's micro-frozen terms; shares still agree to ~1e-4
      assert(math.abs(share - math.round(ep6 / tp * 1e6)) <= 200,
        s"period $k: $share vs ${ep6 / tp * 1e6}")
      assert(peak == (ep6 == 1000000L), s"peak flag at period $k")
    }
  }

  test("q_hampel matches a direct sliding-window recount") {
    val byDay = dailyCnt.toMap
    def median(v: Seq[Long]): Double = {
      val s = v.sorted
      if (s.length % 2 == 1) s(s.length / 2).toDouble
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val expect = dailyCnt.map { case (ep, x) =>
      val win = (-3L to 3L).flatMap(o => byDay.get(ep + o))
      val m4 = math.round(median(win) * 4)
      val mad8 = math.round(median(win.map(v =>
        math.abs(v * 4 - m4))) * 2)
      (ep, x, m4, mad8,
        math.abs(x * 4 - m4) * 20000 > mad8 * 44478)
    }
    val got = q("q_hampel")
      .select($"day".cast("string"), $"x", $"m4", $"mad8", $"is_out")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => (java.time.LocalDate.parse(r._1).toEpochDay,
        r._2, r._3, r._4, r._5)).sortBy(_._1)
    assert(got.toSeq == expect.toSeq)
  }

  /** Per-user (duration, event) rows — the q_kaplan_meier convention. */
  private lazy val durations: Seq[(Long, Boolean)] =
    graft.Tables.load(spark, d, "events")
      .select($"user_id",
        org.apache.spark.sql.functions.datediff(
          org.apache.spark.sql.functions.to_date($"ts"),
          org.apache.spark.sql.functions.lit("2024-01-01")).as("day"),
        ($"event_type" === "purchase" && $"value" > 100.0).as("q"))
      .as[(Long, Int, Boolean)].collect().toSeq
      .groupBy(_._1).values.map { rs =>
        val fd = rs.map(_._2).min; val ld = rs.map(_._2).max
        val dd = rs.filter(_._3).map(_._2).sorted.headOption
        ((dd.getOrElse(ld) - fd).toLong, dd.isDefined)
      }.toSeq

  test("q_nelson_aalen matches a textbook cumulative-hazard loop") {
    val byDay = durations.groupBy(_._1).map { case (day, v) =>
      (day, v.count(_._2).toLong, v.length.toLong) }.toSeq.sortBy(_._1)
    var atRiskLeft = durations.length.toLong
    var h = BigDecimal(0)
    val expect = byDay.map { case (day, deaths, cnt) =>
      val atRisk = atRiskLeft
      h += BigDecimal(deaths.toDouble / atRisk)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      atRiskLeft -= cnt
      (day, atRisk, deaths, math.round(h.toDouble * 1e6),
        math.round(math.exp(-h.toDouble) * 1e6))
    }
    val got = q("q_nelson_aalen")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3,
        s"day ${g._1} frame")
      assert(math.abs(g._4 - e._4) <= 2, s"H at day ${g._1}")
      assert(math.abs(g._5 - e._5) <= 2, s"S at day ${g._1}")
    }
  }

  test("q_theil_u matches a day-map recount") {
    val j = dailyRev.toSeq.flatMap { case (ep, r) =>
      for (f7 <- dailyRev.get(ep - 7); f1 <- dailyRev.get(ep - 1))
        yield (r, f7, f1) }
    val se7 = j.map { case (r, f, _) => BigInt(r - f) * BigInt(r - f) }.sum
    val se1 = j.map { case (r, _, f) => BigInt(r - f) * BigInt(r - f) }.sum
    val row = q("q_theil_u").as[(Long, Long, Long, Long)].collect().head
    assert(row._1 == j.length.toLong)
    assert(math.abs(row._2 -
      math.round(math.sqrt(se7.toDouble / se1.toDouble) * 1e6)) <= 2)
    assert(math.abs(row._3 -
      math.round(math.sqrt(se7.toDouble / j.length))) <= 1)
    assert(math.abs(row._4 -
      math.round(math.sqrt(se1.toDouble / j.length))) <= 1)
  }

  test("q_croston matches the textbook sequential EWMA recursion") {
    // SEQUENTIAL updates — a genuinely different arithmetic path than
    // the query's dissolved closed-form weighted sums
    val cust = graft.Tables.load(spark, d, "customer")
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey").as[Long].collect().toSet
    val days = graft.Tables.load(spark, d, "orders")
      .select($"o_custkey",
        org.apache.spark.sql.functions.to_date($"o_orderdate")
          .cast("string"))
      .as[(Long, String)].collect()
      .filter(r => cust(r._1))
      .groupBy(r => java.time.LocalDate.parse(r._2).toEpochDay)
      .map { case (ep, v) => (ep, v.length.toLong) }.toSeq.sortBy(_._1)
    val a = 0.2
    var z = days.head._2.toDouble
    var p = 0.0
    days.zipWithIndex.drop(1).foreach { case ((ep, x), i) =>
      z = z + a * (x - z)
      val iv = (ep - days(i - 1)._1).toDouble
      p = if (i == 1) iv else p + a * (iv - p)
    }
    val row = q("q_croston")
      .as[(Long, Long, Long, Long)].collect().head
    assert(row._1 == days.length.toLong)
    assert(math.abs(row._2 - math.round(z * 1e6)) <= 5,
      s"z ${row._2} vs ${z * 1e6}")
    assert(math.abs(row._3 - math.round(p * 1e6)) <= 5,
      s"p ${row._3} vs ${p * 1e6}")
    assert(math.abs(row._4 - math.round(z / p * 1e6)) <= 10)
  }

  test("q_assortativity matches a direct degree-correlation recount") {
    val edges = graft.Tables.load(spark, d, "orders")
      .select($"o_orderkey", $"o_custkey")
      .join(graft.Tables.load(spark, d, "lineitem")
        .select($"l_orderkey".as("o_orderkey"), $"l_suppkey"),
        "o_orderkey")
      .select($"o_custkey", $"l_suppkey")
      .as[(Long, Long)].collect().distinct
    val dj = edges.groupBy(_._1).map { case (k, v) => k -> v.length }
    val dk = edges.groupBy(_._2).map { case (k, v) => k -> v.length }
    val js = edges.map(e => dj(e._1).toDouble)
    val ks = edges.map(e => dk(e._2).toDouble)
    val n = edges.length.toDouble
    val num = n * js.zip(ks).map(p => p._1 * p._2).sum - js.sum * ks.sum
    val den = math.sqrt(n * js.map(x => x * x).sum - js.sum * js.sum) *
      math.sqrt(n * ks.map(x => x * x).sum - ks.sum * ks.sum)
    val row = q("q_assortativity").as[(Long, Long)].collect().head
    assert(row._1 == edges.length.toLong)
    assert(math.abs(row._2 - math.round(num / den * 1e6)) <= 2,
      s"r ${row._2} vs ${num / den * 1e6}")
  }

  test("q_gains matches a plain user-map recount") {
    val users = graft.Tables.load(spark, d, "events")
      .select($"user_id", $"event_type", $"value")
      .as[(Long, String, Option[Double])].collect()
      .groupBy(_._1).toSeq.map { case (_, v) =>
        (v.length.toLong,
          v.exists(r => r._2 == "purchase" && r._3.exists(_ > 100.0)))
      }
    val tu = users.length.toLong
    val tc = users.count(_._2).toLong
    val byScore = users.groupBy(_._1).toSeq.sortBy(-_._1)
    var (cu, cc) = (0L, 0L)
    val expect = byScore.map { case (sc, v) =>
      cu += v.length; cc += v.count(_._2)
      (sc, v.length.toLong, cu, cc,
        math.round(cc.toDouble / cu / (tc.toDouble / tu) * 1e6))
    }
    val got = q("q_gains")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(-_._1)
    assert(got.toSeq == expect)
  }

  test("q_anderson_darling: same-formula recount is tight; exact-Phi " +
    "comparison bounds the stated A&S approximation") {
    val xs = dailyCnt.map(_._2.toDouble)
    val n = xs.length
    val mu = xs.sum / n
    val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (n - 1))
    val zs = dailyCnt.map { case (ep, x) => ((x - mu) / sd, ep) }
      .sortBy(identity).map(_._1)
    def tailAS(az: Double): Double = {
      val t = 1.0 / (1.0 + 0.2316419 * az)
      val pdf = math.exp(-az * az / 2.0) / 2.5066282746310002
      pdf * ((((1.330274429 * t - 1.821255978) * t + 1.781477937) * t
        - 0.356563782) * t + 0.319381530) * t
    }
    // exact Phi by Simpson integration of the pdf (independent path)
    def phiExact(z: Double): Double = {
      val az = math.abs(z); val steps = 4096
      val h = az / steps
      def pdf(u: Double) = math.exp(-u * u / 2.0) / 2.5066282746310002
      val s = pdf(0) + pdf(az) + (1 until steps).map(i =>
        (if (i % 2 == 1) 4.0 else 2.0) * pdf(i * h)).sum
      val half = s * h / 3.0
      if (z >= 0) 0.5 + half else 0.5 - half
    }
    def a2With(phi: Double => Double): Double = {
      val tsum = zs.zipWithIndex.map { case (z, idx) =>
        val i = idx + 1
        (2.0 * i - 1) * math.log(phi(z)) +
          (2.0 * (n - i) + 1) * math.log(1 - phi(z))
      }.sum
      -n - tsum / n
    }
    def phiAS(z: Double) =
      if (z >= 0) 1.0 - tailAS(z) else tailAS(-z)
    val row = q("q_anderson_darling")
      .as[(Long, Long, Long, Boolean)].collect().head
    assert(row._1 == n.toLong)
    val sameFormula = a2With(phiAS)
    assert(math.abs(row._2 - math.round(sameFormula * 1e6)) <= 10,
      s"a2 ${row._2} vs ${sameFormula * 1e6}")
    val exact = a2With(phiExact)
    assert(math.abs(row._2 / 1e6 - exact) < 2e-3,
      s"A&S drift vs exact Phi: ${row._2 / 1e6} vs $exact")
    val corr = 1.0 + 0.75 / n + 2.25 / (n.toDouble * n)
    assert(math.abs(row._3 -
      math.round(sameFormula * corr * 1e6)) <= 10)
    assert(row._4 == (row._3 > 752000L))
  }

  test("q_burstiness matches a direct token-count recount") {
    val docs = graft.Tables.load(spark, d, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val nn = docs.length.toDouble
    val perDoc = docs.flatMap { case (id, text) =>
      text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (t, v) => (t, id, v.length.toLong) }
    }
    val expect = perDoc.groupBy(_._1).map { case (tok, v) =>
      val tf = v.map(_._3).sum
      val df = v.length.toLong
      val sx2 = v.map(r => r._3.toDouble * r._3).sum
      val mean = tf / nn
      (tok, tf, df,
        math.round((sx2 / nn - mean * mean) / mean * 1e6),
        math.round(tf.toDouble / df * 1e6))
    }.toSeq.sortBy(r => (-r._2, r._1)).take(20)
    val got = q("q_burstiness")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.toSeq == expect)
    // content words burst harder than glue: the top-20's max VMR
    // should comfortably exceed 1 if the fixture has any topicality
    assert(got.map(_._4).max > 1000000L)
  }

  test("q_clustering_coeff matches a from-scratch projection recount " +
    "and q_triangles' own counts") {
    // below the similarity threshold the sf0.001 graph is EMPTY — the
    // stated contract reports zeros (no NULLs)
    assert(q("q_clustering_coeff")
      .as[(Long, Long, Long, Long, Long)].collect().head ==
      ((0L, 0L, 0L, 0L, 0L)))
    // the recount runs where the graph is nonempty
    val d01 = "/root/testdata/sf0.01"
    val co = graft.Tables.load(spark, d01, "orders")
      .select($"o_orderkey", $"o_custkey")
      .join(graft.Tables.load(spark, d01, "lineitem")
        .select($"l_orderkey".as("o_orderkey"), $"l_suppkey"),
        "o_orderkey")
      .select($"o_custkey", $"l_suppkey")
      .as[(Long, Long)].collect().distinct
    val byCust = co.groupBy(_._1).filter(_._2.length <= 64)
    val shared = byCust.values.toSeq.flatMap { sups =>
      val ss = sups.map(_._2).sorted
      for (i <- ss.indices; j <- (i + 1) until ss.length)
        yield (ss(i), ss(j))
    }.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val counts = shared.values.toSeq.sorted
    val h = 0.99 * (counts.length - 1)
    val lo = counts(h.toInt)
    val thr = lo + (counts(math.min(h.toInt + 1, counts.length - 1)) -
      lo) * (h - h.toInt)
    val edges = shared.filter(_._2.toDouble > thr).keys.toSeq
    val eset = edges.toSet
    val tris = (for {
      (a, b) <- edges; (b2, c) <- edges if b2 == b
      if eset((a, c)) } yield 1).size.toLong
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map(_._2.length.toLong)
    val wedges = deg.map(dd => dd * (dd - 1) / 2).sum
    val nodes = deg.size.toLong
    val row = SparkEntry.queries("q_clustering_coeff")(spark, d01)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(row == ((nodes, edges.length.toLong, tris, wedges,
      math.round(3.0 * tris / wedges * 1e6))))
    // cross-query pin: the shared counts must equal q_triangles'
    val t = SparkEntry.queries("q_triangles")(spark, d01)
      .as[(Long, Long, Long)].collect().head
    assert((row._1, row._2, row._3) == t)
  }

  test("q_clustering_coeff_topk matches a from-scratch union-kNN " +
    "recount and honors the |E| <= k*N linearity bound") {
    val d01 = "/root/testdata/sf0.01"
    val co = graft.Tables.load(spark, d01, "orders")
      .select($"o_orderkey", $"o_custkey")
      .join(graft.Tables.load(spark, d01, "lineitem")
        .select($"l_orderkey".as("o_orderkey"), $"l_suppkey"),
        "o_orderkey")
      .select($"o_custkey", $"l_suppkey")
      .as[(Long, Long)].collect().distinct
    val byCust = co.groupBy(_._1).filter(_._2.length <= 64)
    val shared = byCust.values.toSeq.flatMap { sups =>
      val ss = sups.map(_._2).sorted
      for (i <- ss.indices; j <- (i + 1) until ss.length)
        yield (ss(i), ss(j))
    }.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    // per-node top-8 by (shared DESC, neighbor ASC); union-kNN: an
    // edge survives if EITHER endpoint ranks it
    val dirp = shared.toSeq.flatMap { case ((a, b), c) =>
      Seq((a, b, c), (b, a, c)) }
    val edges = dirp.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (-r._3, r._2)).take(8)
        .map(r => (math.min(r._1, r._2), math.max(r._1, r._2)))
    }.toSet.toSeq
    val eset = edges.toSet
    val tris = (for {
      (a, b) <- edges; (b2, c) <- edges if b2 == b
      if eset((a, c)) } yield 1).size.toLong
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map(_._2.length.toLong)
    val wedges = deg.map(dd => dd * (dd - 1) / 2).sum
    val nodes = deg.size.toLong
    val row = SparkEntry.queries("q_clustering_coeff_topk")(spark, d01)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(row == ((nodes, edges.length.toLong, tris, wedges,
      math.round(3.0 * tris / wedges * 1e6))))
    // the whole point of the variant: the per-node budget bounds the
    // edge set linearly in the node universe (the percentile form
    // measured 102x edges for 10x data in SWEEP_r14cmp.md)
    assert(row._2 <= Graph.TopKSimEdges * row._1,
      s"|E|=${row._2} must be <= k*N=${Graph.TopKSimEdges * row._1}")
    // and unlike the percentile form at tiny scale, the kNN graph is
    // nonempty wherever any co-purchase pair exists
    val tiny = q("q_clustering_coeff_topk")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(tiny._1 > 0L && tiny._2 > 0L,
      s"sf0.001 top-k graph must be nonempty, got $tiny")
  }

  /** Per-(event_type, arm) raw value rows for the Welch recounts. */
  private lazy val valRows: Seq[(String, Long, Long)] =
    graft.Tables.load(spark, d, "events")
      .filter($"value".isNotNull)
      .select($"event_type", $"user_id" % 2,
        org.apache.spark.sql.functions
          .expr("CAST(round(value * 1000000.0, 0) AS BIGINT)"))
      .as[(String, Long, Long)].collect().toSeq

  private def phiExactT(z: Double): Double = {
    val az = math.abs(z); val steps = 4096; val h = az / steps
    def pdf(u: Double) = math.exp(-u * u / 2.0) / 2.5066282746310002
    val s = pdf(0) + pdf(az) + (1 until steps).map(i =>
      (if (i % 2 == 1) 4.0 else 2.0) * pdf(i * h)).sum
    if (z >= 0) 0.5 + s * h / 3.0 else 0.5 - s * h / 3.0
  }

  private def welch(rows: Seq[Long], rowsT: Seq[Long]): Double = {
    def mv(v: Seq[Long]) = {
      val xs = v.map(_ / 1e6); val n = xs.length
      val m = xs.sum / n
      (m, xs.map(x => (x - m) * (x - m)).sum / (n - 1), n)
    }
    val (mc, vc, nc) = mv(rows); val (mt, vt, nt) = mv(rowsT)
    (mt - mc) / math.sqrt(vc / nc + vt / nt)
  }

  test("q_bh_fdr matches a textbook BH recount with exact-Phi p-values") {
    val byType = valRows.groupBy(_._1)
    val ps = byType.toSeq.map { case (et, v) =>
      val z = welch(v.filter(_._2 == 0L).map(_._3),
        v.filter(_._2 == 1L).map(_._3))
      (et, z, 2.0 * (1.0 - phiExactT(math.abs(z))))
    }.sortBy(r => (r._3, r._1))
    val m = ps.length
    val k = ps.zipWithIndex
      .filter { case ((_, _, p), i) => p <= 0.05 * (i + 1) / m }
      .map(_._2 + 1).lastOption.getOrElse(0)
    val got = SparkEntry.queries("q_bh_fdr")(spark, d)
      .as[(String, Long, Long, Long, Boolean)].collect().sortBy(_._4)
    assert(got.length == m)
    got.zip(ps).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g._1 == e._1, s"rank ${i + 1} order")
      assert(math.abs(g._2 - math.round(e._2 * 1e6)) <= 3,
        s"z(${e._1})")
      // query uses the A&S tail (|err| < 7.5e-8 in Phi)
      assert(math.abs(g._3 - math.round(e._3 * 1e6)) <= 2,
        s"p(${e._1}): ${g._3} vs ${e._3 * 1e6}")
      assert(g._4 == i + 1)
      assert(g._5 == (i + 1 <= k), s"BH decision at rank ${i + 1}")
    }
  }

  test("q_holm matches a textbook step-down recount and is never " +
    "less conservative than BH") {
    val byType = valRows.groupBy(_._1)
    val ps = byType.toSeq.map { case (et, v) =>
      val z = welch(v.filter(_._2 == 0L).map(_._3),
        v.filter(_._2 == 1L).map(_._3))
      (et, 2.0 * (1.0 - phiExactT(math.abs(z))))
    }.sortBy(r => (r._2, r._1))
    val m = ps.length
    // textbook Holm: reject while p_(i) <= alpha/(m-i+1), stop at the
    // first failure
    val rejects = ps.zipWithIndex.scanLeft(true) {
      case (ok, ((_, p), i)) => ok && p <= 0.05 / (m - i)
    }.tail
    val got = SparkEntry.queries("q_holm")(spark, d)
      .as[(String, Long, Long, Long, Boolean)].collect().sortBy(_._3)
    assert(got.length == m)
    got.zip(ps.zip(rejects)).zipWithIndex.foreach {
      case ((g, ((et, p), rej)), i) =>
        assert(g._1 == et, s"rank ${i + 1} order")
        assert(math.abs(g._2 - math.round(p * 1e6)) <= 2, s"p($et)")
        assert(g._3 == i + 1)
        assert(g._4 == math.round(0.05 / (m - i) * 1e6),
          s"threshold at rank ${i + 1}")
        assert(g._5 == rej, s"Holm decision at rank ${i + 1}")
    }
    // step-down shape: rejections form a PREFIX of the rank order
    val flags = got.map(_._5)
    assert(!flags.sliding(2).exists(w => !w(0) && w(1)),
      "Holm rejections must be a prefix")
    // FWER control is stricter than FDR: Holm rejects a subset of BH
    val bh = SparkEntry.queries("q_bh_fdr")(spark, d)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .filter(_._5).map(_._1).toSet
    assert(got.filter(_._5).map(_._1).toSet.subsetOf(bh))
  }

  test("q_stratified_ate matches a plain stratum-map recount") {
    val users = graft.Tables.load(spark, d, "events")
      .select($"user_id", $"event_type", $"value")
      .as[(Long, String, Option[Double])].collect()
      .groupBy(_._1).toSeq.map { case (uid, v) =>
        (uid % 2, v.length.toLong,
          v.filter(r => r._2 == "purchase" && r._3.isDefined)
            .map(r => math.round(r._3.get * 1e6)).sum)
      }
    val strata = users.groupBy(_._2).toSeq.flatMap { case (_, v) =>
      val c = v.filter(_._1 == 0L); val t = v.filter(_._1 == 1L)
      if (c.isEmpty || t.isEmpty) None
      else Some((c.length + t.length,
        math.round(t.map(_._3).sum.toDouble / t.length -
          c.map(_._3).sum.toDouble / c.length)))
    }
    val ate = math.round(
      strata.map(s => s._1 * s._2).sum.toDouble /
        strata.map(_._1).sum)
    val row = SparkEntry.queries("q_stratified_ate")(spark, d)
      .as[(Long, Long, Long, Long)].collect().head
    assert(row._1 == strata.length.toLong)
    assert(row._2 == strata.map(_._1.toLong).sum)
    assert(math.abs(row._3 - ate) <= 2, s"ate ${row._3} vs $ate")
    val c = users.filter(_._1 == 0L); val t = users.filter(_._1 == 1L)
    val naive = math.round(t.map(_._3).sum.toDouble / t.length -
      c.map(_._3).sum.toDouble / c.length)
    assert(math.abs(row._4 - naive) <= 2)
  }

  test("q_tost matches a direct recount with exact-Phi tails") {
    val c = valRows.filter(_._2 == 0L).map(_._3)
    val t = valRows.filter(_._2 == 1L).map(_._3)
    def mv(v: Seq[Long]) = {
      val xs = v.map(_ / 1e6); val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val (mc, vc) = mv(c); val (mt, vt) = mv(t)
    val diff = mt - mc
    val dl = BigDecimal(0.05 * mc)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val se = math.sqrt(vc / c.length + vt / t.length)
    val p1 = 1.0 - phiExactT((diff + dl) / se)
    val p2 = phiExactT((diff - dl) / se)
    val row = SparkEntry.queries("q_tost")(spark, d)
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(math.abs(row._1 - math.round(diff * 1e6)) <= 2)
    assert(math.abs(row._2 - math.round(dl * 1e6)) <= 2)
    assert(math.abs(row._3 - math.round(se * 1e6)) <= 2)
    assert(math.abs(row._4 - math.round(math.max(p1, p2) * 1e6)) <= 2,
      s"p_tost ${row._4} vs ${math.max(p1, p2) * 1e6}")
    assert(row._5 == (p1 <= 0.05 && p2 <= 0.05))
  }

  test("q_conformal matches a plain split recount") {
    val resid = dailyRev.toSeq.flatMap { case (ep, r) =>
      dailyRev.get(ep - 7).map(f => (ep, math.abs(r - f))) }
    val days = resid.map(_._1.toDouble).sorted
    val pos = 0.5 * (days.length - 1)
    val cutd = math.round(days(pos.toInt) +
      (days(math.min(pos.toInt + 1, days.length - 1)) - days(pos.toInt))
        * (pos - pos.toInt))
    val cal = resid.filter(_._1 <= cutd).map(_._2.toDouble).sorted
    val tst = resid.filter(_._1 > cutd)
    val h = 0.95 * (cal.length - 1)
    val q1 = math.round((cal(h.toInt) +
      (cal(math.min(h.toInt + 1, cal.length - 1)) - cal(h.toInt)) *
        (h - h.toInt)) * 10)
    val nin = tst.count(_._2 * 10 <= q1).toLong
    val row = SparkEntry.queries("q_conformal")(spark, d)
      .as[(Long, Long, Long, Long)].collect().head
    assert(row._1 == cal.length.toLong && row._2 == tst.length.toLong)
    assert(row._3 == q1 / 10, s"q95 ${row._3} vs ${q1 / 10}")
    val cov = math.round(nin.toDouble / tst.length * 1e6)
    assert(math.abs(row._4 - cov) <= 2, s"coverage ${row._4} vs $cov")
    // the conformal guarantee: test coverage should sit near (and in
    // expectation above) the nominal 95% minus finite-sample slack
    assert(row._4 >= 850000L,
      s"coverage ${row._4} far below the conformal guarantee")
  }

  test("q_obrien_fleming matches a textbook day-loop recount and the " +
    "boundary relaxes monotonically to ~1.96") {
    val rows = graft.Tables.load(spark, d, "events")
      .filter($"value".isNotNull)
      .select(org.apache.spark.sql.functions.to_date($"ts")
        .cast("string"), $"user_id" % 2,
        org.apache.spark.sql.functions
          .expr("CAST(round(value * 1000000.0, 0) AS BIGINT)"))
      .as[(String, Long, Long)].collect()
    val n = rows.length
    val s1 = rows.map(r => BigInt(r._3)).sum
    val s2 = rows.map(r => BigInt(r._3) * BigInt(r._3)).sum
    val g = BigDecimal(
      (s2.toDouble / 1e12 - s1.toDouble / 1e6 * s1.toDouble / 1e6 / n)
        / (n - 1)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val days = rows.map(_._1).distinct.sorted
    var (ncc, scc, ntc, stc) = (0L, 0L, 0L, 0L)
    val expect = days.flatMap { day =>
      val dr = rows.filter(_._1 == day)
      val c = dr.filter(_._2 == 0L); val t = dr.filter(_._2 == 1L)
      ncc += c.length; scc += c.map(_._3).sum
      ntc += t.length; stc += t.map(_._3).sum
      if (c.isEmpty || t.isEmpty) None
      else {
        val z = (stc.toDouble / ntc / 1e6 - scc.toDouble / ncc / 1e6) /
          math.sqrt(g * (1.0 / ncc + 1.0 / ntc))
        val b = 1.959964 / math.sqrt((ncc + ntc).toDouble / n)
        Some((day, math.round(z * 1e6), math.round(b * 1e6)))
      }
    }
    val got = q("q_obrien_fleming")
      .select($"day".cast("string"), $"nc", $"nt", $"z_micro",
        $"bound_micro", $"significant")
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .sortBy(_._1)
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (gr, er) =>
      assert(gr._1 == er._1)
      assert(math.abs(gr._4 - er._2) <= 2, s"z at ${gr._1}")
      assert(math.abs(gr._5 - er._3) <= 2, s"bound at ${gr._1}")
      assert(gr._6 == (math.abs(gr._4) > gr._5))
    }
    // OBF shape: the boundary is non-increasing in information and
    // ends at the fixed-horizon z
    val bounds = got.map(_._5)
    bounds.sliding(2).foreach { case Array(a, b) => assert(a >= b)
      case _ => }
    assert(math.abs(bounds.last - 1959964L) <= 2)
  }

  test("q_negbin_fit matches a zeros-included moment recount") {
    val rows = graft.Tables.load(spark, d, "events")
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    val nu = rows.map(_._1).distinct.length
    val expect = rows.groupBy(_._2).toSeq.map { case (et, v) =>
      val per = v.groupBy(_._1).values.map(_.length.toLong).toSeq
      val m = per.sum.toDouble / nu
      val ex2 = per.map(x => x.toDouble * x).sum / nu
      val vr = ex2 - m * m
      (et, nu.toLong, math.round(m * 1e6), math.round(vr * 1e6),
        math.round(vr / m * 1e6),
        if (vr > m) math.round(m * m / (vr - m) * 1e6) else 0L,
        vr > m)
    }.sortBy(_._1)
    val got = q("q_negbin_fit")
      .as[(String, Long, Long, Long, Long, Long, Boolean)]
      .collect().sortBy(_._1)
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._7 == e._7)
      assert(math.abs(g._3 - e._3) <= 2 && math.abs(g._4 - e._4) <= 2)
      assert(math.abs(g._5 - e._5) <= 2, s"dispersion ${g._1}")
      assert(math.abs(g._6 - e._6) <= 5, s"r ${g._1}")
    }
  }

  test("q_stl_lite matches a direct decomposition recount") {
    val byDay = dailyCnt.toMap
    val win = dailyCnt.flatMap { case (ep, x) =>
      val w = (-3L to 3L).flatMap(o => byDay.get(ep + o))
      if (w.length == 7) Some((ep, x, 7 * x - w.sum)) else None
    }
    val seas = win.groupBy { case (ep, _, _) =>
      java.time.LocalDate.ofEpochDay(ep).getDayOfWeek.getValue }
      .map { case (dow, v) =>
        dow -> math.round(v.map(_._3).sum.toDouble / v.length / 7 * 1e6) }
    val parts = win.map { case (ep, x, det7) =>
      val dow = java.time.LocalDate.ofEpochDay(ep).getDayOfWeek.getValue
      val t6 = math.round((x - det7 / 7.0) * 1e6)
      val s6 = seas(dow)
      val r6 = math.round(det7 / 7.0 * 1e6) - s6
      (x, t6, s6, r6)
    }
    val n = parts.length.toDouble
    def popVar(xs: Seq[Double]) = {
      val m = xs.sum / n; xs.map(v => v * v).sum / n - m * m }
    val vT = popVar(parts.map(_._1.toDouble))
    val row = q("q_stl_lite")
      .as[(Long, Long, Long, Long)].collect().head
    assert(row._1 == parts.length.toLong)
    assert(math.abs(row._2 -
      math.round(popVar(parts.map(_._2.toDouble / 1e6)) / vT * 1e6)) <= 3)
    assert(math.abs(row._3 -
      math.round(popVar(parts.map(_._3.toDouble / 1e6)) / vT * 1e6)) <= 3)
    assert(math.abs(row._4 -
      math.round(popVar(parts.map(_._4.toDouble / 1e6)) / vT * 1e6)) <= 3)
  }

  test("q_cooks_distance matches a textbook OLS-influence recount") {
    val pts = dailyRev.toSeq.sortBy(_._1)
    val n = pts.length
    val ts = pts.map(_._1.toDouble); val rs = pts.map(_._2.toDouble)
    val tb = ts.sum / n
    val b = (n * ts.zip(rs).map(p => p._1 * p._2).sum -
      ts.sum * rs.sum) / (n * ts.map(t => t * t).sum - ts.sum * ts.sum)
    val a = (rs.sum - b * ts.sum) / n
    val es = pts.map { case (t, r) =>
      math.round((r - (a + b * t)) * 100) / 100.0 }
    val s2 = es.map(e => e * e).sum / (n - 2)
    val sttC = ts.map(t => (t - tb) * (t - tb)).sum
    val got = q("q_cooks_distance")
      .select($"day".cast("string"), $"r", $"resid_cents",
        $"leverage_micro", $"cook_d_micro", $"influential")
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .sortBy(_._1)
    assert(got.length == n)
    got.zip(pts).zip(es).foreach { case ((g, (t, r)), e) =>
      assert(java.time.LocalDate.parse(g._1).toEpochDay == t)
      assert(g._2 == r)
      assert(math.abs(g._3 - math.round(e)) <= 1)
      val h = 1.0 / n + (t - tb) * (t - tb) / sttC
      assert(math.abs(g._4 - math.round(h * 1e6)) <= 2)
      val dd = e * e * h / (2 * s2 * (1 - h) * (1 - h))
      assert(math.abs(g._5 - math.round(dd * 1e6)) <= 3,
        s"D at ${g._1}: ${g._5} vs ${dd * 1e6}")
      assert(g._6 == (dd > 4.0 / n))
    }
  }

  test("q_shapiro_francia: same-formula recount + sanity bounds") {
    val xs = dailyCnt.sortBy(r => (r._2, r._1))
    val n = xs.length
    def probit(p: Double): Double = {
      def half(q: Double) = {
        val t = math.sqrt(-2 * math.log(q))
        t - (2.515517 + 0.802853 * t + 0.010328 * t * t) /
          (1 + 1.432788 * t + 0.189269 * t * t + 0.001308 * t * t * t)
      }
      if (p < 0.5) -half(p) else half(1 - p)
    }
    val ms = xs.indices.map(i =>
      BigDecimal(probit((i + 1 - 0.375) / (n + 0.25)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val vs = xs.map(_._2.toDouble)
    val num = n * vs.zip(ms).map(p => p._1 * p._2).sum -
      vs.sum * ms.sum
    val w2 = num * num /
      ((n * vs.map(v => v * v).sum - vs.sum * vs.sum) *
        (n * ms.map(m => m * m).sum - ms.sum * ms.sum))
    val row = q("q_shapiro_francia").as[(Long, Long)].collect().head
    assert(row._1 == n.toLong)
    assert(math.abs(row._2 - math.round(w2 * 1e6)) <= 5,
      s"W' ${row._2} vs ${w2 * 1e6}")
    assert(row._2 >= 0L && row._2 <= 1000000L)
  }

  test("q_capture_recapture matches a plain overlap recount") {
    val rows = graft.Tables.load(spark, d, "events")
      .select($"user_id", org.apache.spark.sql.functions
        .to_date($"ts").cast("string"))
      .as[(Long, String)].collect()
      .map(r => (r._1, java.time.LocalDate.parse(r._2).toEpochDay))
    val cutd = rows.map(_._2).min + 14
    val users = rows.groupBy(_._1).toSeq.map { case (u, v) =>
      (v.exists(_._2 <= cutd), v.exists(_._2 > cutd)) }
    val n1 = users.count(_._1).toLong; val n2 = users.count(_._2).toLong
    val m = users.count(u => u._1 && u._2).toLong
    val row = q("q_capture_recapture")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(row._1 == users.length.toLong)
    assert((row._2, row._3, row._4) == ((n1, n2, m)))
    assert(math.abs(row._5 -
      math.round(n1.toDouble * n2 / m * 1e6)) <= 2)
    assert(math.abs(row._6 - math.round(
      ((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0) * 1e6)) <= 2)
  }

  test("q_chao1 matches a plain frequency-of-frequencies recount") {
    val tf = graft.Tables.load(spark, d, "documents")
      .select($"text").as[String].collect()
      .flatMap(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map(_._2.length.toLong).toSeq
    val v = tf.length.toLong; val nt = tf.sum
    val f1 = tf.count(_ == 1L).toLong; val f2 = tf.count(_ == 2L).toLong
    val row = q("q_chao1")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert((row._1, row._2, row._3, row._4) == ((v, nt, f1, f2)))
    assert(row._5 == math.round(v + f1.toDouble * (f1 - 1) /
      (2.0 * (f2 + 1))))
    assert(row._6 == math.round(f1.toDouble / nt * 1e6))
    // richness estimate can only add to the observed vocabulary
    assert(row._5 >= v)
  }

  test("q_entropy_rate matches a plain transition-map recount") {
    val rows = graft.Tables.load(spark, d, "events")
      .select($"user_id",
        org.apache.spark.sql.functions.unix_micros($"ts"),
        $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val trans = rows.groupBy(_._1).toSeq.flatMap { case (_, v) =>
      val seq = v.sortBy(r => (r._2, r._3)).map(_._4).toSeq
      seq.zip(seq.drop(1))
    }
    val byFrom = trans.groupBy(_._1)
    val nn = trans.length.toDouble
    val expect = byFrom.toSeq.map { case (f, v) =>
      val h = v.groupBy(_._2).values.map { g =>
        val p = g.length.toDouble / v.length
        BigDecimal(-p * math.log(p))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.sum
      (f, v.length.toLong, math.round(v.length / nn * 1e6),
        math.round(h * 1e6))
    }.sortBy(_._1)
    val rate = byFrom.toSeq.map { case (_, v) =>
      val h = v.groupBy(_._2).values.map { g =>
        val p = g.length.toDouble / v.length; -p * math.log(p) }.sum
      v.length / nn * h
    }.sum
    val got = q("q_entropy_rate")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2)
      assert(math.abs(g._3 - e._3) <= 2)
      assert(math.abs(g._4 - e._4) <= 3, s"H(${g._1})")
      assert(math.abs(g._5 - math.round(rate * 1e6)) <= 5)
    }
    // entropy of a <=6-way categorical is bounded by ln 6
    got.foreach(g => assert(g._4 <= math.round(math.log(6) * 1e6) + 2))
  }

  test("q_hurst matches a direct R/S recount") {
    val xs = dailyCnt.sortBy(_._1).map(_._2)
    val pts = Seq(5, 10, 15).map { w =>
      val rss = xs.grouped(w).filter(_.length == w).flatMap { blk =>
        val bn = blk.length; val bs = blk.sum
        // bn-scaled deviations, as the query computes them
        val cum = blk.map(_ * bn - bs)
          .scanLeft(0L)(_ + _).tail
        val varP = blk.map(x => x.toDouble * x).sum / bn -
          (bs.toDouble / bn) * (bs.toDouble / bn)
        if (varP <= 0) None
        else Some(BigDecimal((cum.max - cum.min).toDouble / bn /
          math.sqrt(varP)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq
      (w, rss.length.toLong, rss.sum / rss.length)
    }
    val ls = pts.map { case (w, _, m) =>
      (BigDecimal(math.log(w)).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(math.log(m)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val k = ls.length
    val hurst = (k * ls.map(p => p._1 * p._2).sum -
      ls.map(_._1).sum * ls.map(_._2).sum) /
      (k * ls.map(p => p._1 * p._1).sum -
        ls.map(_._1).sum * ls.map(_._1).sum)
    val got = q("q_hurst")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(5L, 10L, 15L))
    got.zip(pts).foreach { case (g, (w, nb, m)) =>
      assert(g._2 == nb, s"blocks at w=$w")
      assert(math.abs(g._3 - math.round(m * 1e6)) <= 3,
        s"R/S at w=$w: ${g._3} vs ${m * 1e6}")
      assert(math.abs(g._4 - math.round(hurst * 1e6)) <= 5)
    }
    // R/S grows with window for any non-degenerate series
    assert(got.map(_._3).sliding(2).forall {
      case Array(a, b) => b >= a; case _ => true })
  }

  test("q_jackknife_ratio matches a leave-one-day-out recount") {
    val days = dailyRev.toSeq
    val cnts = graft.Tables.load(spark, d, "orders")
      .groupBy(org.apache.spark.sql.functions.to_date($"o_orderdate")
        .cast("string").as("day"))
      .count().as[(String, Long)].collect()
      .map(r => java.time.LocalDate.parse(r._1).toEpochDay -> r._2)
      .toMap
    val n = days.length
    val tr = days.map(_._2).sum; val tc = cnts.values.sum
    // the query's contract: replicates frozen to integer centicents
    val reps = days.map { case (ep, r) =>
      math.round((tr - r).toDouble / (tc - cnts(ep)) * 100).toDouble
    }
    val mean = reps.sum / n
    val se = math.sqrt((n - 1.0) / n *
      reps.map(t => (t - mean) * (t - mean)).sum)
    val row = q("q_jackknife_ratio")
      .as[(Long, Long, Long)].collect().head
    assert(row._1 == n.toLong)
    assert(math.abs(row._2 - math.round(tr.toDouble / tc * 100)) <= 1)
    assert(math.abs(row._3 - math.round(se)) <= 2,
      s"SE ${row._3} vs $se")
  }

  test("q_runs_test matches a direct run-count recount") {
    val days = dailyRev.toSeq.sortBy(_._1)
    val sorted = days.map(_._2).sorted
    val med2 =
      if (sorted.length % 2 == 1) sorted(sorted.length / 2) * 2
      else sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)
    val sg = days.filter(_._2 * 2 != med2).map(_._2 * 2 > med2)
    val r = 1 + sg.zip(sg.drop(1)).count(p => p._1 != p._2)
    val n1 = sg.count(identity).toLong; val n2 = sg.count(!_).toLong
    val e = 2.0 * n1 * n2 / (n1 + n2) + 1
    val v = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) /
      ((n1 + n2).toDouble * (n1 + n2) * (n1 + n2 - 1))
    val row = q("q_runs_test")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert((row._1, row._2, row._3) == ((r.toLong, n1, n2)))
    assert(math.abs(row._4 - math.round(e * 1e6)) <= 2)
    assert(math.abs(row._5 - math.round((r - e) / math.sqrt(v) * 1e6))
      <= 2)
  }

  test("q_sign_trend matches an exact BigDecimal binomial recount") {
    val days = dailyRev.toSeq.sortBy(_._1).map(_._2)
    val m = days.length / 2
    val pairs = (0 until days.length - m).map(i =>
      (days(i), days(i + m)))
    val plus = pairs.count(p => p._2 > p._1).toLong
    val minus = pairs.count(p => p._2 < p._1).toLong
    val nN = (plus + minus).toInt
    val kK = math.max(plus, minus).toInt
    // exact rational tail via BigDecimal binomials — a COMPLETELY
    // different path than the query's frozen-log spine
    val tail = (kK to nN).map { k =>
      var c = BigDecimal(1)
      for (j <- 1 to k) c = c * (nN - k + j) / j
      c / BigDecimal(2).pow(nN)
    }.sum
    val p = (BigDecimal(2) * tail).min(BigDecimal(1))
    val row = q("q_sign_trend").as[(Long, Long, Long)].collect().head
    assert((row._1, row._2) == ((plus, minus)))
    // the frozen-log spine carries ~1e-9-per-term drift; micro output
    // agrees within a few units
    assert(math.abs(row._3 - math.round(p.toDouble * 1e6)) <= 5,
      s"p ${row._3} vs ${p.toDouble * 1e6}")
  }

  test("q_littles_law matches a direct sessionization recount and " +
    "the L = lambda*W identity") {
    val rows = graft.Tables.load(spark, d, "events")
      .select($"user_id",
        org.apache.spark.sql.functions.unix_timestamp($"ts"))
      .as[(Long, Long)].collect()
    val sessions = rows.groupBy(_._1).toSeq.flatMap { case (_, v) =>
      val ts = v.map(_._2).sorted
      val bounds = scala.collection.mutable.Buffer[(Long, Long)]()
      var st = ts.head; var prev = ts.head
      for (t <- ts.tail) {
        if (t - prev > 1800L) { bounds += ((st, prev)); st = t }
        prev = t
      }
      bounds += ((st, prev))
      bounds.toSeq
    }
    val t0 = rows.map(_._2).min; val t1 = rows.map(_._2).max
    val n = sessions.length.toLong
    val sdur = sessions.map(s => s._2 - s._1).sum
    val hourly = sessions.filter(s => s._2 > s._1).flatMap { s =>
      ((s._1 + 3599) / 3600) to ((s._2 - 1) / 3600) }
      .groupBy(identity).values.map(_.size)
    val peak = if (hourly.isEmpty) 0L else hourly.max.toLong
    val row = q("q_littles_law")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(row._1 == n)
    assert(math.abs(row._2 - math.round(n * 3600.0 / (t1 - t0) * 1e6))
      <= 2)
    assert(math.abs(row._3 - math.round(sdur.toDouble / n * 1e6)) <= 2)
    assert(math.abs(row._4 -
      math.round(sdur.toDouble / (t1 - t0) * 1e6)) <= 2)
    assert(row._5 == peak, s"peak ${row._5} vs $peak")
    // Little's law identity for the closed window: L = lambda * W
    val l = row._4 / 1e6
    val lw = (row._2 / 1e6 / 3600.0) * (row._3 / 1e6)
    assert(math.abs(l - lw) < 1e-4, s"L $l vs lambda*W $lw")
  }

  test("q_theil_index matches a direct recount; contributions sum to " +
    "the corpus Theil and between <= total") {
    val revByCust = graft.Tables.load(spark, d, "orders")
      .select($"o_custkey",
        org.apache.spark.sql.functions
          .expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).toSeq.map { case (k, v) => k -> v.map(_._2).sum }
    val natByCust = graft.Tables.load(spark, d, "customer")
      .select($"c_custkey", $"c_nationkey")
      .as[(Long, Long)].collect().toMap
    val names = graft.Tables.load(spark, d, "nation")
      .select($"n_nationkey", $"n_name")
      .as[(Long, String)].collect().toMap
    val n = revByCust.length
    val sx = revByCust.map(_._2).sum
    val mu = sx.toDouble / n
    def term(x: Long) = {
      val r = x / mu
      BigDecimal(r * math.log(r))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = revByCust.groupBy(c => natByCust(c._1)).toSeq
      .map { case (nk, v) =>
        val contrib = v.map(c => term(c._2)).sum / n
        val s = v.map(_._2).sum.toDouble / sx
        val p = v.length.toDouble / n
        (names(nk), v.length.toLong, math.round(contrib * 1e6),
          math.round(s * math.log(s / p) * 1e6))
      }.sortBy(_._1)
    val got = q("q_theil_index")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2)
      assert(math.abs(g._3 - e._3) <= 3, s"contrib ${g._1}")
      assert(math.abs(g._4 - e._4) <= 3, s"between ${g._1}")
    }
    // decomposition sanity: the between component never exceeds the
    // total Theil (within-group terms are non-negative)
    assert(got.map(_._4).sum <= got.map(_._3).sum + 5)
  }
}
