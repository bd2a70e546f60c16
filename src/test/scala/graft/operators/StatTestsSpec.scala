package graft.operators

import graft.SparkSpec

/** Independent golden checks for the statistical-test and agreement
  * family (the MlFitSpec/SelectionSpec pattern): the DuckDB oracle
  * SHARES each query's formula, so a wrong formula would pass the
  * differential gate on both engines — these tests recompute every
  * statistic from the raw rows in plain Scala, straight from the
  * textbook definition, and compare against the live query. The
  * Mann-Whitney check is the strongest: the query never materializes
  * per-row ranks (value-grain doubled-rank formulation), while the
  * reimplementation sorts rows and assigns average ranks directly. */
class StatTestsSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h8(s: String, m: Long): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16) % m

  private def toks(text: String): Array[String] =
    text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)

  /** attempt category with the planted 1-in-3 bias (4 categories) */
  private def cat4(eventId: Long, userId: Long): Long =
    if (h8(eventId.toString, 3L) == 0L) h8(userId.toString, 4L)
    else h8(eventId.toString, 4L)

  /** attempt answer with the planted 1-in-3 bias (8 answers) */
  private def ans8(eventId: Long, userId: Long): Long =
    if (h8(eventId.toString, 3L) == 0L) h8(userId.toString, 8L)
    else h8(eventId.toString, 8L)

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, d)

  private lazy val docs = graft.Tables.load(spark, d, "documents")
    .select($"doc_id", $"text", $"n_chars")
    .as[(Long, String, Long)].collect()

  private lazy val attempts = graft.Tables.load(spark, d, "events")
    .select($"event_id", $"user_id").as[(Long, Long)].collect()

  test("q_cohen_kappa matches the textbook kappa over recounted cells") {
    val cells = docs.map { case (_, text, nChars) =>
      val ts = toks(text)
      val rich = ts.length >= 75 ||
        (ts.nonEmpty && ts.map(_.length).sum.toDouble / ts.length >= 5.0)
      (if (nChars >= 400) 1 else 0, if (rich) 1 else 0)
    }
    val n11 = cells.count(c => c._1 == 1 && c._2 == 1).toLong
    val n10 = cells.count(c => c._1 == 1 && c._2 == 0).toLong
    val n01 = cells.count(c => c._1 == 0 && c._2 == 1).toLong
    val n00 = cells.count(c => c._1 == 0 && c._2 == 0).toLong
    val n = (n11 + n10 + n01 + n00).toDouble
    val po = (n11 + n00) / n
    val pe = ((n11 + n10) / n) * ((n11 + n01) / n) +
      ((n01 + n00) / n) * ((n10 + n00) / n)
    val kappa = (po - pe) / (1.0 - pe)
    val row = q("q_cohen_kappa")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(row == ((n11, n10, n01, n00, math.round(kappa * 1e6))),
      s"query $row vs recount ($n11,$n10,$n01,$n00,$kappa)")
  }

  test("q_fleiss_kappa matches the textbook multi-rater kappa") {
    val byTask = attempts.groupBy(_._2).filter(_._2.length >= 12)
      .map { case (u, evs) =>
        evs.sortBy(_._1).take(12).map(e => cat4(e._1, u))
      }.toSeq
    val m = byTask.size
    val counts = byTask.map(cs => (0 to 3).map(c => cs.count(_ == c)))
    val pbar = counts.map(cs =>
      (cs.map(x => x * x).sum - 12).toDouble / (12 * 11)).sum / m
    val tot = (0 to 3).map(c => counts.map(_(c)).sum)
    val pe = tot.map(t => math.pow(t.toDouble / (12.0 * m), 2)).sum
    val kappa = (pbar - pe) / (1.0 - pe)
    val got = q("q_fleiss_kappa").select($"fleiss_micro")
      .as[Long].collect().head
    assert(math.abs(got - math.round(kappa * 1e6)) <= 2,
      s"query $got vs recount ${kappa * 1e6}")
  }

  test("q_krippendorff matches the textbook nominal alpha") {
    val byTask = attempts.groupBy(_._2).values
      .map(evs => evs.map(e => cat4(e._1, e._2)))
      .filter(_.length >= 2).toSeq
    val n = byTask.map(_.length).sum.toDouble
    val dObs = byTask.map { cs =>
      val ni = cs.length
      val ss = (0 to 3).map(c => { val k = cs.count(_ == c); k * k }).sum
      (ni.toLong * ni - ss).toDouble / (ni - 1)
    }.sum / n
    val tot = (0 to 3).map(c => byTask.map(_.count(_ == c)).sum.toLong)
    val dExp = (n * n - tot.map(t => (t * t).toDouble).sum) / (n * (n - 1))
    val alpha = 1.0 - dObs / dExp
    val got = q("q_krippendorff").select($"alpha_micro")
      .as[Long].collect().head
    assert(math.abs(got - math.round(alpha * 1e6)) <= 2,
      s"query $got vs recount ${alpha * 1e6}")
  }

  test("q_majority_vote matches a direct first-8 mode recount") {
    // .toSeq BEFORE map: mapping the Map directly to non-pair tuples
    // rebuilds into a deduplicating collection and collapses the tasks
    val perTask = attempts.groupBy(_._2).toSeq.map { case (u, evs) =>
      val sample = evs.sortBy(_._1).take(8).map(e => ans8(e._1, u))
      val mode = sample.groupBy(identity).toSeq
        .map { case (a, g) => (a, g.length) }
        .minBy { case (a, c) => (-c, a) }._1
      (mode == h8(u.toString, 8L), sample.length)
    }
    val nTasks = perTask.size.toLong
    val nCorrect = perTask.count(_._1).toLong
    val row = q("q_majority_vote")
      .select($"n_tasks", $"n_correct", $"acc_micro")
      .as[(Long, Long, Long)].collect().head
    assert(row._1 == nTasks && row._2 == nCorrect, s"$row vs ($nTasks, $nCorrect)")
    assert(row._3 == math.round(nCorrect.toDouble / nTasks * 1e6))
  }

  test("q_mcnemar and q_cochran_q match exact cell recounts") {
    val flags = docs.map { case (id, _, _) =>
      (h8(id.toString + "a", 5L) == 0L, h8(id.toString + "b", 10L) < 3L,
        h8(id.toString + "c", 4L) == 0L)
    }
    val b = flags.count(f => !f._1 && f._2).toLong
    val c = flags.count(f => f._1 && !f._2).toLong
    val chi2 = math.pow(math.abs(b - c) - 1.0, 2) / (b + c)
    val mc = q("q_mcnemar").select($"b", $"c", $"chi2_micro")
      .as[(Long, Long, Long)].collect().head
    assert(mc._1 == b && mc._2 == c, s"$mc vs ($b, $c)")
    assert(math.abs(mc._3 - math.round(chi2 * 1e6)) <= 2)

    // Cochran: models are RIGHT when the hash misses the error band
    val rights = flags.map(f => (!f._1, !f._2, !f._3))
    val t1 = rights.count(_._1).toLong
    val t2 = rights.count(_._2).toLong
    val t3 = rights.count(_._3).toLong
    val ri = rights.map(r =>
      Seq(r._1, r._2, r._3).count(identity).toLong)
    val sr = ri.sum
    val sr2 = ri.map(x => x * x).sum
    val qStat = 2.0 * Seq(t1, t2, t3)
      .map(t => math.pow(3.0 * t - sr, 2)).sum / (3.0 * (3 * sr - sr2))
    val cq = q("q_cochran_q")
      .select($"t1", $"t2", $"t3", $"q_micro")
      .as[(Long, Long, Long, Long)].collect().head
    assert((cq._1, cq._2, cq._3) == ((t1, t2, t3)))
    assert(math.abs(cq._4 - math.round(qStat * 1e6)) <= 2)
  }

  test("q_anova matches a direct F computation from the raw rows") {
    val rows = graft.Tables.load(spark, d, "events")
      .select($"event_type", $"value").as[(String, Double)].collect()
    val groups = rows.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val n = rows.length
    val k = groups.size
    val grand = rows.map(_._2).sum / n
    val ssb = groups.map(g => {
      val m = g.sum / g.length; g.length * (m - grand) * (m - grand)
    }).sum
    val ssw = groups.map(g => {
      val m = g.sum / g.length; g.map(v => (v - m) * (v - m)).sum
    }).sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    val got = q("q_anova").select($"f_micro").as[Long].collect().head
    assert(math.abs(got / 1e6 - f) < 1e-4, s"query ${got / 1e6} vs direct $f")
  }

  test("q_welch_t matches a direct t/df computation") {
    val rows = graft.Tables.load(spark, d, "events")
      .filter($"event_type".isin("click", "error"))
      .select($"event_type", $"value").as[(String, Double)].collect()
    val g1 = rows.filter(_._1 == "click").map(_._2)
    val g2 = rows.filter(_._1 == "error").map(_._2)
    def meanVar(g: Array[Double]) = {
      val m = g.sum / g.length
      (m, g.map(v => (v - m) * (v - m)).sum / (g.length - 1))
    }
    val (m1, v1) = meanVar(g1); val (m2, v2) = meanVar(g2)
    val se1 = v1 / g1.length; val se2 = v2 / g2.length
    val t = (m1 - m2) / math.sqrt(se1 + se2)
    val df = (se1 + se2) * (se1 + se2) /
      (se1 * se1 / (g1.length - 1) + se2 * se2 / (g2.length - 1))
    val row = q("q_welch_t").select($"t_micro", $"df_micro")
      .as[(Long, Long)].collect().head
    assert(math.abs(row._1 / 1e6 - t) < 1e-4, s"t ${row._1 / 1e6} vs $t")
    assert(math.abs(row._2 / 1e6 - df) < 1e-2, s"df ${row._2 / 1e6} vs $df")
  }

  test("q_spearman matches direct per-row ranks with BigInt moments") {
    val rows = graft.Tables.load(spark, d, "lineitem")
      .select($"l_quantity", $"l_discount").as[(Double, Double)].collect()
    // doubled tie-average ranks assigned directly per row
    def dranks(vs: Array[Double]): Array[Long] = {
      val byV = vs.zipWithIndex.sortBy(_._1)
      val out = new Array[Long](vs.length)
      var i = 0
      while (i < byV.length) {
        var j = i
        while (j < byV.length && byV(j)._1 == byV(i)._1) j += 1
        val dr = (i + 1 + j).toLong // 2 * average rank
        (i until j).foreach(x => out(byV(x)._2) = dr)
        i = j
      }
      out
    }
    val dx = dranks(rows.map(_._1)); val dy = dranks(rows.map(_._2))
    val n = BigInt(rows.length)
    val sx = dx.map(BigInt(_)).sum; val sy = dy.map(BigInt(_)).sum
    val sxx = dx.map(v => BigInt(v) * v).sum
    val syy = dy.map(v => BigInt(v) * v).sum
    val sxy = dx.zip(dy).map { case (a, b) => BigInt(a) * b }.sum
    val rho = (n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble) /
      math.sqrt((n * syy - sy * sy).toDouble)
    val row = q("q_spearman").as[(Long, Long)].collect().head
    assert(row._1 == rows.length.toLong)
    assert(math.abs(row._2 / 1e6 - rho) < 1e-4,
      s"rho ${row._2 / 1e6} vs direct $rho")
  }

  test("q_mannwhitney matches per-row average ranks assigned directly") {
    val rows = graft.Tables.load(spark, d, "lineitem")
      .filter($"l_returnflag".isin("A", "R"))
      .select($"l_returnflag", $"l_quantity")
      .as[(String, Double)].collect()
    // direct ranking: sort ALL observations, average ranks over ties
    val sorted = rows.sortBy(_._2)
    val ranks = new Array[Double](sorted.length)
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._2 == sorted(i)._2) j += 1
      val avg = (i + 1 + j).toDouble / 2.0 // mean of ranks i+1..j
      (i until j).foreach(x => ranks(x) = avg)
      i = j
    }
    val n1 = rows.count(_._1 == "A").toLong
    val n2 = rows.count(_._1 == "R").toLong
    val r1 = sorted.zip(ranks).filter(_._1._1 == "A").map(_._2).sum
    val u = r1 - n1 * (n1 + 1) / 2.0
    val tieTerm = sorted.groupBy(_._2).values
      .map(g => { val t = g.length.toLong; (t * t * t - t).toDouble }).sum
    val nn = (n1 + n2).toDouble
    val z = (u - n1 * n2 / 2.0) /
      math.sqrt(n1 * n2 / 12.0 * ((nn + 1) - tieTerm / (nn * (nn - 1))))
    // u2 is DECIMAL(38,0) since the ADVICE-r11 overflow-proofing; the
    // cast back to long is exact at spec scale
    val row = q("q_mannwhitney")
      .select($"n1", $"n2", $"u2".cast("long"), $"z_micro")
      .as[(Long, Long, Long, Long)].collect().head
    assert(row._1 == n1 && row._2 == n2)
    // u2 is the DOUBLED U — integer-exact across formulations
    assert(row._3 == math.round(2.0 * u),
      s"doubled U ${row._3} vs direct ${2.0 * u}")
    assert(math.abs(row._4 / 1e6 - z) < 1e-4, s"z ${row._4 / 1e6} vs $z")
  }

  test("q_wilcoxon matches per-pair average ranks assigned directly") {
    val rows = graft.Tables.load(spark, d, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .as[(Long, Int, Double)].collect()
    val diffs = rows.groupBy(_._1).toSeq.flatMap { case (_, ls) =>
      val odd = ls.filter(_._2 % 2 == 1)
      val even = ls.filter(_._2 % 2 == 0)
      if (odd.isEmpty || even.isEmpty) None
      else {
        val c = odd.map(l => math.round(l._3 * 100)).sum -
          even.map(l => math.round(l._3 * 100)).sum
        if (c == 0L) None else Some(c)
      }
    }
    // direct ranking of |d|, average ranks over ties
    val sorted = diffs.map(c => (math.abs(c), c > 0)).sortBy(_._1)
    val ranks = new Array[Double](sorted.length)
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val avg = (i + 1 + j).toDouble / 2.0
      (i until j).foreach(x => ranks(x) = avg)
      i = j
    }
    val n = sorted.length.toLong
    val wPlus = sorted.zip(ranks).filter(_._1._2).map(_._2).sum
    val tie3 = sorted.groupBy(_._1).values
      .map(g => { val t = g.length.toLong; (t * t * t - t).toDouble }).sum
    val z = (wPlus - n * (n + 1) / 4.0) /
      math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - tie3 / 48.0)
    val row = q("q_wilcoxon").select($"n", $"w2_plus", $"z_micro")
      .as[(Long, Long, Long)].collect().head
    assert(row._1 == n, s"n ${row._1} vs $n")
    assert(row._2 == math.round(2.0 * wPlus),
      s"doubled W+ ${row._2} vs direct ${2.0 * wPlus}")
    assert(math.abs(row._3 / 1e6 - z) < 1e-4, s"z ${row._3 / 1e6} vs $z")
  }

  test("q_levene matches the textbook Brown-Forsythe W") {
    val rows = graft.Tables.load(spark, d, "lineitem")
      .select($"l_returnflag", $"l_extendedprice")
      .as[(String, Double)].collect()
    // exact interpolated median, the (n-1)*p convention both engines use
    def med(vs: Array[Double]): Double = {
      val s = vs.sorted
      val h = (s.length - 1) * 0.5
      val lo = s(h.toInt); val hi = s(math.ceil(h).toInt)
      lo + (h - h.toInt) * (hi - lo)
    }
    val groups = rows.groupBy(_._1).map { case (f, g) =>
      val m = med(g.map(_._2))
      // the query's micro-freeze is part of its definition; in units of
      // micro the W statistic is scale-invariant
      f -> g.map(r => math.round(math.abs(r._2 - m) * 1e6).toDouble)
    }
    val n = rows.length
    val k = groups.size
    val grand = groups.values.map(_.sum).sum / n
    val num = groups.values.map(g => {
      val m = g.sum / g.length; g.length * (m - grand) * (m - grand)
    }).sum
    val den = groups.values.map(g => {
      val m = g.sum / g.length; g.map(v => (v - m) * (v - m)).sum
    }).sum
    val w = ((n - k).toDouble / (k - 1)) * num / den
    val got = q("q_levene").select($"w_micro").as[Long].collect().head
    assert(math.abs(got / 1e6 - w) < 1e-4, s"W ${got / 1e6} vs direct $w")
  }

  test("q_cliff_delta matches the all-pairs dominance recount") {
    val rows = graft.Tables.load(spark, d, "lineitem")
      .filter($"l_returnflag".isin("A", "R"))
      .select($"l_returnflag", $"l_quantity")
      .as[(String, Double)].collect()
    val a = rows.filter(_._1 == "A").map(_._2)
    val r = rows.filter(_._1 == "R").map(_._2)
    // literal quadratic dominance count — the definition the query's
    // value-grain running sums must reproduce exactly
    var gt = 0L; var lt = 0L
    a.foreach(x => r.foreach { y =>
      if (x > y) gt += 1 else if (x < y) lt += 1
    })
    val delta = (gt - lt).toDouble / (a.length.toLong * r.length)
    val row = q("q_cliff_delta").select($"n1", $"n2", $"delta_micro")
      .as[(Long, Long, Long)].collect().head
    assert(row._1 == a.length.toLong && row._2 == r.length.toLong)
    assert(row._3 == math.round(delta * 1e6),
      s"delta ${row._3 / 1e6} vs direct $delta")
  }

  test("q_cohens_d matches a direct pooled-SD effect size") {
    val rows = graft.Tables.load(spark, d, "events")
      .filter($"event_type".isin("click", "error"))
      .select($"event_type", $"value").as[(String, Double)].collect()
    val g1 = rows.filter(_._1 == "click").map(_._2)
    val g2 = rows.filter(_._1 == "error").map(_._2)
    def ssq(g: Array[Double]) = {
      val m = g.sum / g.length; g.map(v => (v - m) * (v - m)).sum
    }
    val sp2 = (ssq(g1) + ssq(g2)) / (g1.length + g2.length - 2)
    val dEff = (g1.sum / g1.length - g2.sum / g2.length) / math.sqrt(sp2)
    val gEff = dEff * (1.0 - 3.0 / (4.0 * (g1.length + g2.length) - 9.0))
    val row = q("q_cohens_d").select($"d_micro", $"g_micro")
      .as[(Long, Long)].collect().head
    assert(math.abs(row._1 / 1e6 - dEff) < 1e-4,
      s"d ${row._1 / 1e6} vs $dEff")
    assert(math.abs(row._2 / 1e6 - gEff) < 1e-4,
      s"g ${row._2 / 1e6} vs $gEff")
  }

  test("q_logrank matches the textbook two-group statistic") {
    val rows = graft.Tables.load(spark, d, "events")
      .select($"user_id",
        org.apache.spark.sql.functions.datediff(
          org.apache.spark.sql.functions.to_date($"ts"),
          org.apache.spark.sql.functions.lit("2024-01-01")).as("day"),
        ($"event_type" === "purchase" && $"value" > 100.0).as("qq"))
      .as[(Long, Int, Boolean)].collect()
    val byUser = rows.groupBy(_._1).toSeq.map { case (u, evs) =>
      val fd = evs.map(_._2).min
      val ld = evs.map(_._2).max
      val dd = evs.filter(_._3).map(_._2).minOption
      (u % 2, dd.getOrElse(ld) - fd, dd.isDefined)
    }
    var num = 0.0; var varSum = 0.0; var o1 = 0L; var nDays = 0L
    byUser.map(_._2).distinct.sorted.foreach { t =>
      val atRisk = byUser.filter(_._2 >= t)
      val nn = atRisk.size.toDouble
      val n1 = atRisk.count(_._1 == 0L).toDouble
      val d1 = byUser.count(x => x._2 == t && x._3 && x._1 == 0L)
      val dj = byUser.count(x => x._2 == t && x._3).toDouble
      if (dj > 0 && nn > 1) {
        num += d1 - dj * n1 / nn
        varSum += dj * (n1 / nn) * (1 - n1 / nn) * (nn - dj) / (nn - 1)
        o1 += d1; nDays += 1
      }
    }
    val chi2 = num * num / varSum
    val row = q("q_logrank").select($"n_days", $"o1", $"chi2_micro")
      .as[(Long, Long, Long)].collect().head
    assert(row._1 == nDays && row._2 == o1, s"$row vs ($nDays, $o1)")
    assert(math.abs(row._3 / 1e6 - chi2) < 1e-3,
      s"chi2 ${row._3 / 1e6} vs $chi2")
  }

  test("q_durbin_watson matches a direct OLS-residual recount") {
    val rows = graft.Tables.load(spark, d, "orders")
      .select(org.apache.spark.sql.functions.to_date($"o_orderdate")
        .as("day"), $"o_totalprice")
      .as[(java.sql.Date, Double)].collect()
    val daily = rows.groupBy(_._1).toSeq.map { case (day, g) =>
      (day.toLocalDate.toEpochDay, g.map(r => math.round(r._2 * 100)).sum)
    }.sortBy(_._1)
    val d0 = daily.map(_._1).min
    val pts = daily.map { case (ep, yc) => ((ep - d0).toDouble, yc.toDouble) }
    val n = pts.length
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val b0 = (sy - b1 * sx) / n
    val e = pts.map { case (t, y) => y - (b0 + b1 * t) }
    val numDW = e.sliding(2).map(p => (p(1) - p(0)) * (p(1) - p(0))).sum
    val dw = numDW / e.map(v => v * v).sum
    val row = q("q_durbin_watson").as[(Long, Long)].collect().head
    assert(row._1 == n.toLong, s"n_days ${row._1} vs $n")
    assert(math.abs(row._2 / 1e6 - dw) < 1e-3,
      s"DW ${row._2 / 1e6} vs $dw")
  }

  test("q_holt_winters matches an imperative sequential recount") {
    // CRITICAL golden: both engines run the same declarative fold (and
    // DuckDB 1.0's struct-state list_reduce is provably buggy — see the
    // query's Scaladoc), so only an independent imperative walk pins
    // the recursion itself
    val rows = graft.Tables.load(spark, d, "events")
      .select(org.apache.spark.sql.functions.to_date($"ts").as("day"))
      .groupBy($"day").count()
      .orderBy($"day")
      .select($"count".cast("double")).as[Double].collect()
    val l0 = rows.take(7).sum / 7.0
    val b0 = (rows.slice(7, 14).sum / 7.0 - l0) / 7.0
    var s = rows.take(7).map(_ - l0).toList
    var l = l0; var b = b0
    rows.drop(7).foreach { yv =>
      val ln = 0.3 * (yv - s.head) + 0.7 * (l + b)
      val bn = 0.1 * (ln - l) + 0.9 * b
      val sn = 0.2 * (yv - ln) + 0.8 * s.head
      s = s.tail :+ sn; l = ln; b = bn
    }
    val expected = (1 to 7).map(h =>
      (h.toLong, math.round((l + h * b + s(h - 1)) * 1e6),
        math.round(l * 1e6), math.round(b * 1e6)))
    val got = q("q_holt_winters")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  test("q_tukey_hsd matches direct pairwise studentized-range stats") {
    val rows = graft.Tables.load(spark, d, "events")
      .filter($"event_type".isin("click", "error", "view"))
      .select($"event_type", $"value").as[(String, Double)].collect()
    val gs = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def ssq(g: Array[Double]) = {
      val m = g.sum / g.length; g.map(v => (v - m) * (v - m)).sum
    }
    val n = rows.length
    val mse = gs.values.map(ssq).sum / (n - 3)
    def qstat(a: String, bb: String): Long = {
      val ga = gs(a); val gb = gs(bb)
      val stat = math.abs(ga.sum / ga.length - gb.sum / gb.length) /
        math.sqrt(mse / 2.0 * (1.0 / ga.length + 1.0 / gb.length))
      math.round(stat * 1e6)
    }
    val got = q("q_tukey_hsd").as[(String, String, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) ==
      Seq(("click", "error"), ("click", "view"), ("error", "view")))
    got.foreach { case (g1, g2, qm) =>
      assert(math.abs(qm - qstat(g1, g2)) <= 2,
        s"($g1,$g2) $qm vs ${qstat(g1, g2)}")
    }
  }

  test("q_permutation_test matches a direct md5-permutation recount") {
    val rows = graft.Tables.load(spark, d, "events")
      .filter($"event_type".isin("click", "error"))
      .select($"event_id", $"event_type" === "click", $"value")
      .as[(Long, Boolean, Double)].collect()
    val v6 = rows.map(r => (r._1, r._2, math.round(r._3 * 1e6)))
    val n1 = v6.count(_._2).toLong; val nn = v6.length.toLong
    val s1 = v6.filter(_._2).map(_._3).sum; val st = v6.map(_._3).sum
    val obs = math.round(math.abs(
      s1.toDouble / n1 - (st - s1).toDouble / (nn - n1)))
    val thr = n1 * 1000000L / nn
    val nGe = (0 until 32).count { b =>
      val asg = v6.map(r => (h8(s"${r._1}_p$b", 1000000L) < thr, r._3))
      val n1b = asg.count(_._1).toLong; val nb = asg.length.toLong
      val s1b = asg.filter(_._1).map(_._2).sum
      val sb = asg.map(_._2).sum
      math.round(math.abs(
        s1b.toDouble / n1b - (sb - s1b).toDouble / (nb - n1b))) >= obs
    }.toLong
    val row = q("q_permutation_test")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(row == ((n1, nn - n1, obs, nGe,
      math.round((nGe + 1).toDouble / 33.0 * 1e6))),
      s"query $row vs recount ($n1, ${nn - n1}, $obs, $nGe)")
  }

  test("q_theil_sen matches a direct pairwise-slope median recount") {
    val rows = graft.Tables.load(spark, d, "orders")
      .select(org.apache.spark.sql.functions
        .date_trunc("week", $"o_orderdate").cast("date")
        .as("day"), $"o_totalprice")
      .as[(java.sql.Date, Double)].collect()
    val daily = rows.groupBy(_._1).toSeq.map { case (day, g) =>
      (day.toLocalDate.toEpochDay, g.map(r => math.round(r._2 * 100)).sum)
    }.sortBy(_._1)
    val d0 = daily.map(_._1).min
    val pts = daily.map { case (ep, yc) => ((ep - d0).toDouble, yc.toDouble) }
    def medInterp(vs: Seq[Double]): Double = {
      val s = vs.sorted
      val h = (s.length - 1) * 0.5
      val lo = s(h.toInt); val hi = s(math.ceil(h).toInt)
      lo + (h - h.toInt) * (hi - lo)
    }
    val slopes = for {
      i <- pts.indices; j <- pts.indices if pts(j)._1 > pts(i)._1
    } yield (pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1)
    val ms = medInterp(slopes)
    val mi = medInterp(pts.map { case (t, y) => y - ms * t })
    val row = q("q_theil_sen")
      .as[(Long, Long, Long, Long)].collect().head
    assert(row._1 == pts.length.toLong)
    assert(row._2 == slopes.length.toLong)
    assert(math.abs(row._3 - math.round(ms * 1e6)) <= 1,
      s"slope ${row._3} vs ${ms * 1e6}")
    // mi is in cents; the query emits TRUE microdollars (cents * 1e4)
    assert(math.abs(row._4 - math.round(mi * 10000)) <= 1,
      s"intercept ${row._4} vs ${mi * 10000}")
  }

  test("q_cusum matches the direct max(0, S + d) recursion") {
    // the query computes the chart via the reflection identity
    // S_t = P_t - min(0, min P_k); this recount runs the textbook
    // recursion itself, so a wrong identity cannot pass
    val daily = graft.Tables.load(spark, d, "events")
      .groupBy(org.apache.spark.sql.functions.to_date($"ts").as("day"))
      .count().orderBy($"day")
      .select($"day".cast("string"), $"count")
      .as[(String, Long)].collect()
    val n = daily.length
    val mu = daily.map(_._2).sum.toDouble / n
    val sg = math.sqrt(
      daily.map(r => BigInt(r._2) * BigInt(r._2)).sum.toDouble / n -
        mu * mu)
    val hm = math.round(4.0 * sg * 1e6)
    var s = 0L
    val expected = daily.map { case (day, x) =>
      val dm = math.round((x - mu - 0.5 * sg) * 1e6)
      s = math.max(0L, s + dm)
      (day, x, s, s > hm)
    }.toSeq
    val got = q("q_cusum")
      .select($"day".cast("string"), $"x", $"s_micro", $"alarm")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  test("q_stump matches a brute-force threshold scan") {
    val rows = graft.Tables.load(spark, d, "documents")
      .select($"n_chars", ($"lang" === "en").cast("long"))
      .as[(Long, Long)].collect()
    val nn = rows.length.toLong
    val grain = rows.groupBy(_._1).toSeq.map { case (sc, g) =>
      (sc, g.length.toLong, g.map(_._2).sum)
    }.sortBy(_._1)
    var cn = 0L; var cp = 0L
    val pp = grain.map(_._3).sum
    val cands = grain.init.map { case (sc, gn, gp) =>
      cn += gn; cp += gp
      val nl = cn.toDouble; val nr = (nn - cn).toDouble
      val pl = cp / nl; val pr = (pp - cp) / nr
      val gini = (nl * (2 * pl * (1 - pl)) + nr * (2 * pr * (1 - pr))) / nn
      val acc = (math.max(cp, cn - cp) +
        math.max(pp - cp, (nn - cn) - (pp - cp))).toDouble / nn
      (sc, math.round(gini * 1e6), math.round(acc * 1e6))
    }
    // account for the last grain value consumed by init vs filter:
    // query filters cn < nn which also drops exactly the last row
    val best = cands.minBy(c => (c._2, c._1))
    val row = q("q_stump")
      .as[(Long, Long, Long, Long)].collect().head
    assert(row == ((best._1, best._2, best._3, nn)),
      s"query $row vs recount $best (n=$nn)")
  }

  test("q_did matches a direct four-cell recount") {
    val rows = graft.Tables.load(spark, d, "events")
      .select($"user_id",
        org.apache.spark.sql.functions.datediff(
          org.apache.spark.sql.functions.to_date($"ts"),
          org.apache.spark.sql.functions.lit("2024-01-01")),
        $"value")
      .as[(Long, Int, Double)].collect()
    def cell(t: Boolean, po: Boolean) =
      rows.filter(r => (r._1 % 2 == 1) == t && (r._2 >= 15) == po)
        .map(_._3)
    def mv(g: Array[Double]) = {
      val m = g.sum / g.length
      (m, g.map(v => (v - m) * (v - m)).sum / (g.length - 1) / g.length)
    }
    val (m00, v00) = mv(cell(false, false))
    val (m01, v01) = mv(cell(false, true))
    val (m10, v10) = mv(cell(true, false))
    val (m11, v11) = mv(cell(true, true))
    val did = (m11 - m10) - (m01 - m00)
    val se = math.sqrt(v00 + v01 + v10 + v11)
    val row = q("q_did").select($"did_micro", $"se_micro")
      .as[(Long, Long)].collect().head
    assert(math.abs(row._1 / 1e6 - did) < 1e-4,
      s"did ${row._1 / 1e6} vs $did")
    assert(math.abs(row._2 / 1e6 - se) < 1e-4,
      s"se ${row._2 / 1e6} vs $se")
  }

  test("q_experiment_report rows equal the standalone queries exactly") {
    // the capstone promises the SAME expression trees as the parts —
    // integer equality, not tolerance
    val rep = q("q_experiment_report")
      .as[(String, Long)].collect().toMap
    val welch = q("q_welch_t").select($"t_micro", $"df_micro")
      .as[(Long, Long)].collect().head
    assert(rep("welch_t") == welch._1 && rep("welch_df") == welch._2,
      s"welch (${rep("welch_t")}, ${rep("welch_df")}) vs $welch")
    val cd = q("q_cohens_d").select($"d_micro", $"g_micro")
      .as[(Long, Long)].collect().head
    assert(rep("cohens_d") == cd._1 && rep("hedges_g") == cd._2,
      s"cohens (${rep("cohens_d")}, ${rep("hedges_g")}) vs $cd")
    val did = q("q_did").select($"did_micro", $"se_micro")
      .as[(Long, Long)].collect().head
    assert(rep("did") == did._1 && rep("did_se") == did._2,
      s"did (${rep("did")}, ${rep("did_se")}) vs $did")
  }
}
