package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Golden recounts for the round-14 additions (q_wilson_ci, q_rdd,
  * q_dp_count, q_neg_sampling, q_loo_source, q_pca_var_explained,
  * q_simpsons, q_mmd; q_holm's recount lives in InferenceSpec beside
  * the phi helpers it shares with q_bh_fdr) — the corpus-governance /
  * release-statistics batch. The DuckDB oracle
  * SHARES each query's formula, so a wrong formula would pass both
  * engines; each statistic here is recomputed INDEPENDENTLY in plain
  * Scala from the raw sf0.001 rows (BigInt moment sums, textbook
  * closed forms, a from-scratch md5 inverse-CDF draw, an explicit
  * matrix Rayleigh quotient). */
class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** round(x, scale) the way Spark/DuckDB round doubles: HALF_UP. */
  private def r(x: Double, scale: Int): Double =
    BigDecimal.valueOf(x)
      .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def rL(x: Double): Long =
    BigDecimal.valueOf(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def toks(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  test("q_wilson_ci matches a closed-form recount per event type") {
    val rows = graft.Tables.load(spark, d, "events")
      .select($"event_type", $"value".isNotNull)
      .as[(String, Boolean)].collect()
    val z = 1.959963984540054
    val z2 = 3.841458820694124
    val expect = rows.groupBy(_._1).toSeq.map { case (t, rs) =>
      val n = rs.size.toDouble
      val k = rs.count(_._2).toDouble
      val p = k / n
      val den = 1.0 + z2 / n
      val ctr = (p + z2 / (2.0 * n)) / den * 1e6
      val hw = z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n)) /
        den * 1e6
      (t, n.toLong, k.toLong, rL(p * 1e6), rL(ctr - hw), rL(ctr + hw))
    }.sortBy(_._1)
    val got = q("q_wilson_ci")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(g => (g._1, g._2, g._3)) ==
      expect.map(e => (e._1, e._2, e._3)))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) <= 2, s"${g._1} p")
      assert(math.abs(g._5 - e._5) <= 2, s"${g._1} lo")
      assert(math.abs(g._6 - e._6) <= 2, s"${g._1} hi")
      assert(g._5 <= g._4 && g._4 <= g._6, s"${g._1} CI must bracket p")
    }
  }

  test("q_rdd matches a per-side BigInt-moment OLS recount") {
    val yc = graft.Tables.load(spark, d, "orders")
      .select($"o_custkey", $"o_totalprice")
      .as[(Long, Double)].collect()
      .groupBy(_._1)
      .map { case (c, rs) => c -> rs.map(x => rL(x._2 * 100)).sum }
    val pan = graft.Tables.load(spark, d, "customer")
      .select($"c_custkey", $"c_acctbal")
      .as[(Long, Double)].collect()
      .map { case (c, ab) => (rL(ab * 100), yc.getOrElse(c, 0L)) }
      .filter { case (xc, _) => math.abs(xc) <= 100000L }
    def fit(side: Seq[(Long, Long)]): Option[(Double, Double)] = {
      val n = side.size
      if (n < 2) return None
      val sx = side.map(p => BigInt(p._1)).sum
      val sy = side.map(p => BigInt(p._2)).sum
      val sxx = side.map(p => BigInt(p._1) * BigInt(p._1)).sum
      val sxy = side.map(p => BigInt(p._1) * BigInt(p._2)).sum
      val den = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
      if (den == 0.0) return None
      val b1 = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        den
      Some((b1, (sy.toDouble - b1 * sx.toDouble) / n.toDouble))
    }
    val l = fit(pan.filter(_._1 < 0).toSeq)
    val rr = fit(pan.filter(_._1 >= 0).toSeq)
    val got = q("q_rdd").as[(Long, Long, Option[Long], Option[Long],
      Option[Long])].collect().head
    assert(got._1 == pan.count(_._1 < 0).toLong)
    assert(got._2 == pan.count(_._1 >= 0).toLong)
    (got._3, l) match {
      case (Some(g), Some((b1, _))) =>
        assert(math.abs(g - rL(b1 * 1e6)) <= 2, "left slope")
      case (None, None) => ()
      case other => fail(s"left slope mismatch: $other")
    }
    (got._4, rr) match {
      case (Some(g), Some((b1, _))) =>
        assert(math.abs(g - rL(b1 * 1e6)) <= 2, "right slope")
      case (None, None) => ()
      case other => fail(s"right slope mismatch: $other")
    }
    (got._5, l, rr) match {
      case (Some(g), Some((_, b0l)), Some((_, b0r))) =>
        assert(math.abs(g - rL(b0r - b0l)) <= 2, "effect")
      case (None, _, _) => assert(l.isEmpty || rr.isEmpty)
      case other => fail(s"effect mismatch: $other")
    }
  }

  test("q_dp_count matches a from-scratch md5 inverse-CDF Laplace draw") {
    val counts = graft.Tables.load(spark, d, "events")
      .select($"event_type").as[String].collect()
      .groupBy(identity).map { case (t, rs) => t -> rs.size.toLong }
    val expect = counts.toSeq.map { case (t, n) =>
      val h = java.lang.Long.parseLong(
        md5hex("dp_" + t).substring(0, 8), 16) % 1000000L
      val dev = 2L * h + 1L - 1000000L
      val k = 1000000L - math.abs(dev)
      val noise = (if (dev > 0) 1.0 else -1.0) *
        (r(math.log(1000000.0), 9) - r(math.log(k.toDouble), 9))
      (t, n, rL(noise * 1e6), rL((n.toDouble + noise) * 1e6))
    }.sortBy(_._1)
    val got = q("q_dp_count")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == expect)
    // the draw must actually perturb: not every noise term is zero
    assert(got.exists(_._3 != 0L), "all-zero Laplace noise")
  }

  test("q_neg_sampling matches a sqrt-composed unigram^0.75 recount") {
    val cnt = graft.Tables.load(spark, d, "documents")
      .select($"text").as[String].collect()
      .flatMap(toks).groupBy(identity)
      .map { case (t, rs) => t -> rs.size.toLong }
    val w9 = cnt.map { case (t, n) =>
      t -> BigDecimal.valueOf(
        math.sqrt(n.toDouble * math.sqrt(n.toDouble)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    val tw = w9.values.sum.toDouble
    val expect = cnt.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
      .map { case (t, n) =>
        (t, n, rL(w9(t).toDouble * 1e6), rL(w9(t).toDouble / tw * 1e6))
      }
    val got = q("q_neg_sampling")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.map(g => (g._1, g._2, g._3)) ==
      expect.map(e => (e._1, e._2, e._3)))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) <= 1, s"${g._1} p_micro") }
    // rare-word boost (the point of the 3/4 power): per-occurrence
    // mass w/n strictly decreases as the count grows — checked on the
    // exact recount weights, away from output rounding
    val perOcc = cnt.toSeq.sortBy(_._2)
      .map { case (t, n) => (n, w9(t).toDouble / n) }
    perOcc.sliding(2).foreach { w =>
      if (w(1)._1 > w(0)._1)
        assert(w(1)._2 < w(0)._2,
          "sub-linear smoothing must favor rarer tokens per occurrence")
    }
  }

  test("q_loo_source matches a closed-form leave-one-out recount") {
    val rows = graft.Tables.load(spark, d, "documents")
      .select($"source", $"n_chars").as[(String, Long)].collect()
    val bySrc = rows.groupBy(_._1)
      .map { case (s0, rs) => s0 -> (rs.size.toLong, rs.map(_._2).sum) }
    val nn = rows.size.toLong
    val ss = rows.map(_._2).sum
    val expect = bySrc.toSeq.sortBy(_._1).map { case (s0, (n, sc)) =>
      val loo =
        if (nn == n) None
        else Some(rL((ss.toDouble / nn -
          (ss - sc).toDouble / (nn - n)) * 1e6))
      (s0, n, rL(sc.toDouble / n * 1e6), loo)
    }
    val got = q("q_loo_source")
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(got.map(g => (g._1, g._2)) ==
      expect.map(e => (e._1, e._2)))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) <= 1, s"${g._1} mean")
      (g._4, e._4) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) <= 1, s"${g._1} loo")
        case (None, None) => ()
        case other => fail(s"${g._1} loo mismatch: $other")
      }
    }
    // identity check on the exact recount: a source whose mean sits
    // above the corpus mean must have a positive delta (removing it
    // drags the mean down), and vice versa
    val corpusMean = ss.toDouble / nn
    expect.foreach { case (s0, n, _, loo) =>
      val srcMean = bySrc(s0)._2.toDouble / n
      loo.foreach { dl =>
        if (srcMean > corpusMean) assert(dl >= 0L, s"$s0 sign")
        if (srcMean < corpusMean) assert(dl <= 0L, s"$s0 sign")
      }
    }
  }

  test("q_simpsons matches a per-group + pooled BigInt-moment recount") {
    val rows = graft.Tables.load(spark, d, "lineitem")
      .select($"l_returnflag", $"l_discount", $"l_quantity")
      .as[(String, Double, Double)].collect()
      .map { case (g, x, y) => (g, rL(x * 100), rL(y * 100)) }
    def slope(v: Seq[(Long, Long)]): Option[Double] = {
      val n = v.size
      val sx = v.map(p => BigInt(p._1)).sum
      val sy = v.map(p => BigInt(p._2)).sum
      val sxx = v.map(p => BigInt(p._1) * BigInt(p._1)).sum
      val sxy = v.map(p => BigInt(p._1) * BigInt(p._2)).sum
      val den = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
      if (den == 0.0) None
      else Some((n.toDouble * sxy.toDouble -
        sx.toDouble * sy.toDouble) / den)
    }
    val pooled = slope(rows.map(r => (r._2, r._3)).toSeq)
    val expect = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (g, v) =>
        val sl = slope(v.map(r => (r._2, r._3)).toSeq)
        (g, v.size.toLong, sl.map(b => rL(b * 1e6)),
          pooled.map(b => rL(b * 1e6)),
          for (a <- sl; b <- pooled) yield a * b < 0.0)
      }
    val got = q("q_simpsons").as[(String, Long, Option[Long],
      Option[Long], Option[Boolean])].collect().toSeq
    assert(got.map(g => (g._1, g._2)) == expect.map(e => (e._1, e._2)))
    got.zip(expect).foreach { case (g, e) =>
      (g._3, e._3) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) <= 2, s"${g._1} slope")
        case (None, None) => ()
        case other => fail(s"${g._1} slope: $other")
      }
      (g._4, e._4) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) <= 2, s"${g._1} pooled")
        case (None, None) => ()
        case other => fail(s"${g._1} pooled: $other")
      }
      assert(g._5 == e._5, s"${g._1} flip flag")
    }
  }

  test("q_mmd matches an explicit kernel-mean-embedding recount and " +
    "dominates its own mean-only part") {
    val vecs = graft.Tables.load(spark, d, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) =>
        (id % 2, v.map(x => rL(x.toDouble * 1000)).toArray)
      }
    val dim = vecs.head._2.length
    def half(h: Long) = vecs.filter(_._1 == h).map(_._2)
    val (xs, ys) = (half(0L), half(1L))
    val (nx, ny) = (xs.length.toDouble, ys.length.toDouble)
    def diff(f: Array[Long] => Long): Double =
      xs.map(v => BigInt(f(v))).sum.toDouble / nx -
        ys.map(v => BigInt(f(v))).sum.toDouble / ny
    var tot = BigDecimal(0)
    var mt = BigDecimal(0)
    for (i <- 0 until dim; j <- 0 until dim) {
      val d2 = diff(v => v(i) * v(j))
      tot += BigDecimal.valueOf(d2 * d2)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    for (i <- 0 until dim) {
      val dm = diff(v => v(i))
      val t = BigDecimal.valueOf(2.0 * dm * dm * 1e6)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      tot += t; mt += t
    }
    val got = q("q_mmd").as[(Long, Long, Long, Long)].collect().head
    assert(got._1 == xs.length.toLong && got._2 == ys.length.toLong)
    assert(math.abs(got._3 - rL(tot.toDouble / 1000.0)) <= 2, "mmd2")
    assert(math.abs(got._4 - rL(mt.toDouble / 1000.0)) <= 2, "mean part")
    // MMD^2 >= its first-order component (every added term is a square)
    assert(got._3 >= got._4, "second-order terms are nonnegative")
  }

  test("q_cv_kfold matches a rotation recount and every row is a " +
    "test row exactly once") {
    val rows = graft.Tables.load(spark, d, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        $"l_extendedprice")
      .as[(Long, Int, Double, Double)].collect()
      .map { case (ok, ln, x, y) =>
        val h = java.lang.Long.parseLong(
          md5hex(s"$ok-$ln").substring(0, 8), 16) % 5L
        (h, x.toLong, rL(y * 100))
      }
    val byFold = rows.groupBy(_._1)
    assert(byFold.values.map(_.size).sum == rows.length)
    val expect = byFold.toSeq.sortBy(_._1).map { case (fold, v) =>
      val test = v
      val train = rows.filter(_._1 != fold)
      def mom(s0: Seq[(Long, Long, Long)]) = (
        s0.size.toDouble,
        s0.map(r => BigInt(r._2)).sum.toDouble,
        s0.map(r => BigInt(r._3)).sum.toDouble,
        s0.map(r => BigInt(r._2) * BigInt(r._2)).sum.toDouble,
        s0.map(r => BigInt(r._2) * BigInt(r._3)).sum.toDouble)
      val (rn, rsx, rsy, rsxx, rsxy) = mom(train.toSeq)
      val b1 = (rn * rsxy - rsx * rsy) / (rn * rsxx - rsx * rsx)
      val b0 = (rsy - b1 * rsx) / rn
      val mse = test.map { case (_, x, y) =>
        val e = y.toDouble - b0 - b1 * x.toDouble; e * e
      }.sum / test.size
      (fold, test.size.toLong, rL(b0 * 1e4), rL(b1 * 1e4), mse)
    }
    val got = q("q_cv_kfold")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(g => (g._1, g._2)) ==
      expect.map(e => (e._1, e._2)))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) <= 2, s"fold ${g._1} intercept")
      assert(math.abs(g._4 - e._4) <= 2, s"fold ${g._1} slope")
      // per-row residual recount vs the query's SSE expansion: same
      // statistic, different summation order — allow double noise
      assert(math.abs(g._5 - rL(e._5 / 1e4 * 1e6)) <=
        math.max(4, (e._5 / 1e4 * 1e6 * 1e-9).toLong),
        s"fold ${g._1} mse ${g._5} vs ${rL(e._5 / 1e4 * 1e6)}")
    }
  }

  test("q_qte matches a sorted-grid type-1 quantile recount") {
    val vals = graft.Tables.load(spark, d, "events")
      .filter($"value".isNotNull)
      .select($"user_id", $"value")
      .as[(Long, Double)].collect()
      .map { case (u, v) => (u % 2, rL(v * 100)) }
    def q1(arm: Long, pct: Long): Long = {
      val xs = vals.filter(_._1 == arm).map(_._2).sorted
      // smallest value whose CDF clears pct/100 (type-1)
      xs(math.max(0,
        math.ceil(xs.length.toDouble * pct / 100.0).toInt - 1))
    }
    val expect = Seq(25L, 50L, 75L).map { p =>
      val (c, t) = (q1(0L, p), q1(1L, p))
      (p, c, t, t - c)
    }
    val got = q("q_qte").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expect)
  }

  test("q_iv_2sls matches a plain user-map Wald/OLS/F recount") {
    val users = graft.Tables.load(spark, d, "events")
      .select($"user_id", $"event_type", $"value")
      .as[(Long, String, Option[Double])].collect()
      .groupBy(_._1).toSeq.map { case (uid, v) =>
        (uid % 2, v.size.toLong,
          v.filter(r => r._2 == "purchase" && r._3.isDefined)
            .map(r => rL(r._3.get * 1e6)).sum)
      }
    val n = users.size.toDouble
    val sz = users.map(_._1).sum.toDouble
    val sx = users.map(_._2).sum.toDouble
    val sy = users.map(u => BigInt(u._3)).sum.toDouble
    val szx = users.map(u => u._1 * u._2).sum.toDouble
    val szy = users.map(u => BigInt(u._1 * u._3)).sum.toDouble
    val sxx = users.map(u => BigInt(u._2) * BigInt(u._2)).sum.toDouble
    val sxy = users.map(u => BigInt(u._2) * BigInt(u._3)).sum.toDouble
    val (czx, czy) = (n * szx - sz * sx, n * szy - sz * sy)
    val (cxx, cxy) = (n * sxx - sx * sx, n * sxy - sx * sy)
    val czz = n * sz - sz * sz
    val r2 = czx * czx / (czz * cxx)
    val got = q("q_iv_2sls")
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().head
    assert(got._1 == users.size.toLong)
    assert(math.abs(got._2.get - rL(czy / czx)) <= 2, "beta_iv")
    assert(math.abs(got._3.get - rL(cxy / cxx)) <= 2, "beta_ols")
    assert(math.abs(got._4.get -
      rL((n - 2.0) * r2 / (1.0 - r2) * 1e6)) <= 2, "first-stage F")
    // with a parity instrument uncorrelated with exposure by design,
    // the F gate should report weakness honestly rather than NULL
    assert(got._4.get >= 0L)
  }

  test("q_event_study matches a plain week-map recount and is zero " +
    "at the base week by construction") {
    val rows = graft.Tables.load(spark, d, "events")
      .filter($"value".isNotNull)
      .select($"user_id",
        org.apache.spark.sql.functions.to_date($"ts").cast("string"),
        $"value")
      .as[(Long, String, Double)].collect()
      .map { case (u, day, v) =>
        val epoch = java.time.LocalDate.parse(day).toEpochDay -
          java.time.LocalDate.parse("2024-01-15").toEpochDay
        (u % 2, math.floor(epoch / 7.0).toLong, rL(v * 1e6))
      }
    val base = {
      val w = rows.filter(_._2 == -1L)
      val c = w.filter(_._1 == 0L); val t = w.filter(_._1 == 1L)
      t.map(x => BigInt(x._3)).sum.toDouble / t.size -
        c.map(x => BigInt(x._3)).sum.toDouble / c.size
    }
    val expect = rows.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (rw, v) =>
        val c = v.filter(_._1 == 0L); val t = v.filter(_._1 == 1L)
        val gap =
          if (c.isEmpty || t.isEmpty) None
          else Some(t.map(x => BigInt(x._3)).sum.toDouble / t.size -
            c.map(x => BigInt(x._3)).sum.toDouble / c.size)
        (rw, c.size.toLong, t.size.toLong, gap.map(rL),
          gap.map(g => rL(g - base)))
      }
    val got = q("q_event_study")
      .as[(Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(got.map(g => (g._1, g._2, g._3)) ==
      expect.map(e => (e._1, e._2, e._3)))
    got.zip(expect).foreach { case (g, e) =>
      (g._4, e._4) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) <= 2, s"week ${g._1} gap")
        case (None, None) => ()
        case other => fail(s"week ${g._1} gap: $other")
      }
      (g._5, e._5) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) <= 2, s"week ${g._1} effect")
        case (None, None) => ()
        case other => fail(s"week ${g._1} effect: $other")
      }
    }
    // the textbook normalization: the base week's effect is exactly 0
    assert(got.find(_._1 == -1L).flatMap(_._5).contains(0L))
  }

  test("q_pca_var_explained matches an explicit BigInt Rayleigh " +
    "quotient and sits in (0, 1]") {
    val vecs = graft.Tables.load(spark, d, "embeddings")
      .select($"embedding").as[Seq[Float]].collect()
      .map(_.map(x => BigInt(rL(x.toDouble * 1000))).toArray)
    val dim = vecs.head.length
    val n = BigInt(vecs.length)
    val mi = Array.tabulate(dim)(i => vecs.map(_(i)).sum)
    val s = Array.tabulate(dim, dim)((i, j) =>
      vecs.map(v => v(i) * v(j)).sum)
    val m = Array.tabulate(dim, dim)((i, j) => n * s(i)(j) - mi(i) * mi(j))
    val v1 = Array.tabulate(dim)(j => (0 until dim).map(i => m(i)(j)).sum)
    val mx1 = v1.map(_.abs).max
    val v1n = v1.map(v =>
      BigInt(rL(BigDecimal(v).toDouble / BigDecimal(mx1).toDouble * 1e6)))
    val vmv = (for (i <- 0 until dim; j <- 0 until dim)
      yield v1n(i) * m(i)(j) * v1n(j)).sum
    val vtv = v1n.map(v => v * v).sum
    val tr = (0 until dim).map(i => m(i)(i)).sum
    val share = BigDecimal(vmv).toDouble / BigDecimal(vtv).toDouble /
      BigDecimal(tr).toDouble
    val got = q("q_pca_var_explained")
      .as[(Long, Long, Long)].collect().head
    assert(got._1 == dim.toLong)
    assert(math.abs(got._2 - rL(share * 1e6)) <= 2, "pc1 share")
    assert(got._3 == tr.toLong, "trace")
    assert(got._2 > 0L && got._2 <= 1000000L,
      "PC1 share must lie in (0, 1]")
  }
}
