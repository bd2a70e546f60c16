package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Independent-implementation goldens for the MlFit queries: each query's
  * distributed result is recomputed by a straight-line single-machine
  * reimplementation over the collected corpus (the BpeSpec pattern) and
  * compared exactly — pinning the semantics against a SECOND independent
  * path beside the DuckDB oracle hash the driver checks. */
class MlFitSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  test("q_logistic matches a plain 2-step Newton/IRLS reimplementation") {
    def r9(x: Double): BigDecimal = BigDecimal.valueOf(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def rL(x: Double): Long = BigDecimal.valueOf(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val grid = graft.Tables.load(spark, d, "lineitem")
      .select($"l_quantity", ($"l_returnflag" === "R").cast("long"))
      .as[(Double, Long)].collect()
      .groupBy { case (q, _) => rL(q * 100) }
      .map { case (xc, v) => (xc, v.size.toLong, v.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val tn = grid.map(_._2).sum.toDouble
    val s1 = grid.map(_._3).sum.toDouble
    val sx = grid.map(g => BigInt(g._1) * BigInt(g._2)).sum.toDouble
    val sx1 = grid.map(g => BigInt(g._1) * BigInt(g._3)).sum.toDouble
    val sxx = grid.map(g =>
      BigInt(g._1) * BigInt(g._1) * BigInt(g._2)).sum.toDouble
    def solve(g0: Double, g1: Double, h00: Double, h01: Double,
        h11: Double): (Double, Double) = {
      val det = h00 * h11 - h01 * h01
      ((h11 * g0 - h01 * g1) / det, (h00 * g1 - h01 * g0) / det)
    }
    val (b0a, b1a) = solve(s1 - tn / 2.0, (sx1 - sx / 2.0) / 100.0,
      tn / 4.0, sx / 400.0, sxx / 40000.0)
    var (g0, g1c) = (BigDecimal(0), BigDecimal(0))
    var (h00, h01c, h11cc) = (BigDecimal(0), BigDecimal(0), BigDecimal(0))
    grid.foreach { case (xc, n, n1) =>
      val p9 = r9(1.0 / (1.0 + math.exp(-(b0a + b1a * xc / 100.0))))
      val w9 = r9(p9.toDouble * (1.0 - p9.toDouble))
      val g0t = BigDecimal(n1) - BigDecimal(n) * p9
      g0 += g0t; g1c += BigDecimal(xc) * g0t
      h00 += BigDecimal(n) * w9
      h01c += BigDecimal(xc) * BigDecimal(n) * w9
      h11cc += BigDecimal(xc) * BigDecimal(xc) * BigDecimal(n) * w9
    }
    val (db0, db1) = solve(g0.toDouble, g1c.toDouble / 100.0,
      h00.toDouble, h01c.toDouble / 100.0, h11cc.toDouble / 10000.0)
    val got = SparkEntry.queries("q_logistic")(spark, d)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got._1 == grid.size.toLong)
    assert(got._2 == tn.toLong)
    assert(math.abs(got._3 - rL((b0a + db0) * 1e6)) <= 2,
      s"b0 ${got._3} vs ${rL((b0a + db0) * 1e6)}")
    assert(math.abs(got._4 - rL((b1a + db1) * 1e6)) <= 2,
      s"b1 ${got._4} vs ${rL((b1a + db1) * 1e6)}")
    // sanity: overall base rate maps back through the fitted curve at
    // the mean quantity to something inside (0, 1)
    val pMean = 1.0 / (1.0 +
      math.exp(-((b0a + db0) + (b1a + db1) * sx / tn / 100.0)))
    assert(pMean > 0.0 && pMean < 1.0)
  }

  test("q_kmeans matches a local 2-round Lloyd reimplementation") {
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .select($"vec_id", expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
        .as("vi"))
      .as[(Long, Array[Long])].collect().sortBy(_._1)
    val k = 8
    def sqDistL(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var j = 0
      while (j < a.length) { val t = a(j) - b(j); s += t * t; j += 1 }
      s
    }
    def sqDistD(a: Array[Long], b: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) { val t = a(j) - b(j); s += t * t; j += 1 }
      s
    }
    // round 1: exact integer distances to the first-k seed vectors
    val cent0 = vecs.take(k).map(_._2)
    val a1 = vecs.map { case (id, v) =>
      id -> (0 until k).minBy(c => (sqDistL(v, cent0(c)), c))
    }.toMap
    // round-1 centroids: exact rational means
    val byC1 = vecs.groupBy { case (id, _) => a1(id) }
    val cent1 = (0 until k).map { c =>
      val m = byC1(c).map(_._2)
      Array.tabulate(64)(j => m.map(_(j)).sum.toDouble / m.length)
    }
    // round 2: double distances against the rational centroids
    val a2 = vecs.map { case (id, v) =>
      id -> (0 until k).minBy(c => (sqDistD(v, cent1(c)), c))
    }.toMap
    val byC2 = vecs.groupBy { case (id, _) => a2(id) }
    val expected = (0 until k).map { c =>
      val m = byC2(c).map(_._2)
      (c, m.length.toLong, (1 to 4).map(j =>
        BigDecimal(m.map(_(j - 1)).sum.toDouble / m.length / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }

    val got = SparkEntry.queries("q_kmeans")(spark, d)
      .as[(Int, Long, Double, Double, Double, Double)].collect().toSeq
      .map(r => (r._1, r._2, Seq(r._3, r._4, r._5, r._6)))
    assert(got.map(g => (g._1, g._2)) === expected.map(e => (e._1, e._2)))
    got.zip(expected).foreach { case (g, e) =>
      g._3.zip(e._3).foreach { case (gv, ev) =>
        assert(math.abs(gv - ev) <= 1e-6, s"cluster ${g._1}: $gv vs $ev")
      }
    }
  }

  test("q_naive_bayes matches a local NB reimplementation exactly") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)]
      .collect()
    val toks = docs.map { case (id, lang, text) =>
      (id, lang, text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty))
    }.filter(_._3.nonEmpty)
    val langs = toks.map(_._2).distinct.sorted
    val nDocs = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nTotal = toks.length.toLong
    val cnt = toks.flatMap(t => t._3.map(w => (t._2, w)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tot = toks.groupBy(_._2).view
      .mapValues(_.map(_._3.length.toLong).sum).toMap
    val v = toks.flatMap(_._3).distinct.length.toLong
    // argmax with the query's tie-break (score desc, then lang asc)
    val pred = toks.map { case (_, actual, ws) =>
      val scoresByLang = langs.map { l =>
        val ll = ws.map(w => math.log(
          (cnt.getOrElse((l, w), 0L) + 1).toDouble / (tot(l) + v))).sum
        (l, ll + math.log(nDocs(l).toDouble / nTotal))
      }
      (actual, scoresByLang.sortBy { case (l, sc) => (-sc, l) }.head._1)
    }
    val expected = pred.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val got = SparkEntry.queries("q_naive_bayes")(spark, d)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === expected, s"got $got\nexpected $expected")
  }

  test("naive Bayes shuffle-join fallback matches the broadcast path " +
      "and actually drops the hint") {
    // the open-web-vocabulary path (model too big to broadcast): same
    // confusion matrix, different join strategy
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val b = MlFit.naiveBayesConfusion(docs, broadcastModel = true)
      .as[(String, String, Long)].collect().toSeq
    val s = MlFit.naiveBayesConfusion(docs, broadcastModel = false)
      .as[(String, String, Long)].collect().toSeq
    assert(b === s, s"broadcast vs shuffle diverged:\n$b\n$s")
    // the fallback's LOGICAL plan carries no broadcast hint on the
    // vocab-sized model join (AQE may still pick broadcast from runtime
    // stats — that's the point — so assert on the analyzed plan, which
    // records only what we requested)
    val analyzed = MlFit.naiveBayesConfusion(docs, broadcastModel = false)
      .queryExecution.analyzed.toString
    val broadcastCount = "ResolvedHint".r.findAllIn(analyzed).length
    val withHint = MlFit.naiveBayesConfusion(docs, broadcastModel = true)
      .queryExecution.analyzed.toString
    val broadcastCountHinted = "ResolvedHint".r.findAllIn(withHint).length
    assert(broadcastCountHinted == broadcastCount + 1,
      s"expected exactly one extra broadcast hint on the model join " +
        s"(got $broadcastCountHinted vs $broadcastCount)")
  }

  test("native sq_l2 is value-identical to the HOF executable spec " +
    "(both signatures)") {
    val vi = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS a")
    // long-long: pair each vector with the reversed one (distinct values)
    val ll = vi.selectExpr("a", "reverse(a) AS b")
      .selectExpr(s"sq_l2(a, b) AS native",
        s"${MlFit.sqDistLong("a", "b")} AS hof")
      .selectExpr("count(*) AS n", "sum(CAST(native != hof AS INT)) AS bad")
      .as[(Long, Long)].head()
    assert(ll._1 > 0 && ll._2 == 0, s"long-long mismatches: $ll")
    // long-double: vs a rational centroid-like array (a/3 per dim)
    val ld = vi.selectExpr("a",
        "transform(reverse(a), x -> CAST(x AS DOUBLE) / 3) AS b")
      .selectExpr(s"sq_l2(a, b) AS native",
        s"${MlFit.sqDistDouble("a", "b")} AS hof")
      // bit-identical, not approximately equal: same fold order
      .selectExpr("count(*) AS n", "sum(CAST(native != hof AS INT)) AS bad")
      .as[(Long, Long)].head()
    assert(ld._1 > 0 && ld._2 == 0, s"long-double mismatches: $ld")
  }

  test("sq_l2 rejects malformed vectors instead of silently coercing") {
    // ADVICE r7: length mismatch used to min-truncate and null elements
    // read as 0 — both now throw (the fixed-D embedding contract)
    def causeChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    val mismatch = intercept[Exception] {
      spark.sql("SELECT sq_l2(array(1L, 2L), array(1L, 2L, 3L))").head()
    }
    assert(causeChain(mismatch).exists(_.contains("length mismatch")),
      causeChain(mismatch).mkString(" | "))
    val nul = intercept[Exception] {
      spark.sql(
        "SELECT sq_l2(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L))")
        .head()
    }
    assert(causeChain(nul).exists(_.contains("null element")),
      causeChain(nul).mkString(" | "))
    // and the happy path still computes (both signatures)
    assert(spark.sql("SELECT sq_l2(array(1L, 2L), array(3L, 4L))")
      .head().getLong(0) == 8L)
    assert(spark.sql(
      "SELECT sq_l2(array(1L, 2L), array(CAST(3 AS DOUBLE), 4.0))")
      .head().getDouble(0) == 8.0)
  }

  test("q_bootstrap_ci matches a local MD5-replicating reimplementation") {
    val cdf = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
      0.9994058151824183, 0.9999167588507119, 0.9999897508033253)
    val rows = spark.read.parquet(s"$d/orders.parquet")
      .selectExpr("o_orderkey || '-' || o_custkey AS key",
        "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS y")
      .as[(String, Long)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val r = 32
    val sy = Array.fill(r)(0L); val sw = Array.fill(r)(0L)
    rows.foreach { case (key, y) =>
      (0 until r).foreach { rep =>
        val h = md5hex(s"${key}_${rep / 2}")
        val slice = h.substring(13 * (rep % 2), 13 * (rep % 2) + 13)
        val u = java.lang.Long.parseLong(slice, 16) / 4503599627370496.0
        val w = cdf.indexWhere(u < _) match { case -1 => 8; case k => k }
        sy(rep) += w * y; sw(rep) += w.toLong
      }
    }
    val means = (0 until r).map(rep => sy(rep).toDouble / sw(rep)).sorted
    def r6(v: Double): Double =
      BigDecimal.valueOf(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    val expected = (rows.length.toLong,
      r6(rows.map(_._2).sum.toDouble / rows.length / 100.0),
      r6(means(1) / 100.0), r6(means(30) / 100.0))
    val got = SparkEntry.queries("q_bootstrap_ci")(spark, d)
      .as[(Long, Double, Double, Double)].head()
    assert(got === expected, s"got $got expected $expected")
    // and the statistical sanity the CI exists to provide
    assert(got._3 < got._2 && got._2 < got._4)
  }

  test("q_brier matches a direct mean-squared-error recount") {
    val rows = graft.Tables.load(spark, d, "orders")
      .select($"o_totalprice",
        ($"o_orderstatus" === "F").cast("long"))
      .as[(Double, Long)].collect()
    val mn = rows.map(_._1).min; val mx = rows.map(_._1).max
    val terms = rows.map { case (p, y) =>
      val p6 = math.round((p - mn) / (mx - mn) * 1e6)
      val diff = p6 - y * 1000000L
      BigInt(diff) * BigInt(diff)
    }
    val brier = (terms.sum.toDouble / terms.length) / 1e12
    val got = SparkEntry.queries("q_brier")(spark, d)
      .as[(Long, Long)].head()
    assert(got._1 == rows.length.toLong)
    assert(math.abs(got._2 - math.round(brier * 1e6)) <= 1,
      s"brier ${got._2 / 1e6.toDouble} vs $brier")
  }

  test("q_log_loss matches a direct clipped cross-entropy recount") {
    val rows = graft.Tables.load(spark, d, "orders")
      .select($"o_totalprice",
        ($"o_orderstatus" === "F").cast("long"))
      .as[(Double, Long)].collect()
    val mn = rows.map(_._1).min; val mx = rows.map(_._1).max
    val terms = rows.map { case (p, y) =>
      val p6 = math.min(math.max(
        math.round((p - mn) / (mx - mn) * 1e6), 1L), 999999L)
      val pr = p6 / 1e6
      if (y == 1L) math.log(pr) else math.log(1.0 - pr)
    }
    val ll = -terms.sum / terms.length
    val got = SparkEntry.queries("q_log_loss")(spark, d)
      .as[(Long, Long)].head()
    assert(got._1 == rows.length.toLong)
    assert(math.abs(got._2 / 1e6 - ll) < 1e-4,
      s"logloss ${got._2 / 1e6} vs $ll")
  }

  test("q_map matches a direct AP@10 recount on the query's cosines") {
    // the cosines come from the same codegen expression (that contract
    // is q_similarity's); the recount exercises the AP composition —
    // ranks, cumulative precision, normalization, zero-hit probes
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val probes = e.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"label".as("q_label"),
        $"embedding".as("q_emb"))
    val scored = e.filter($"vec_id" >= 8)
      .crossJoin(org.apache.spark.sql.functions.broadcast(probes))
      .select($"q_id", $"q_label", $"vec_id", $"label",
        expr("cosine_sim(embedding, q_emb)").as("cos"))
      .as[(Long, Int, Long, Int, Double)].collect()
    // panel contract (r12): zero-pool probes are REPORTED with
    // r_tot = 0 / ap_micro = 0, not dropped
    val expected = scored.groupBy(_._1).toSeq.map { case (qid, rs) =>
      val qlabel = rs.head._2
      val rTot = rs.count(_._4 == qlabel).toLong
      if (rTot == 0L) (qid, 0L, 0L, 0L)
      else {
        val top = rs.sortBy(r => (-r._5, r._3)).take(10)
        var cum = 0L; var sp = 0L; var nh = 0L
        top.zipWithIndex.foreach { case (r, i) =>
          if (r._4 == qlabel) {
            cum += 1; nh += 1
            sp += math.round(cum.toDouble / (i + 1) * 1e6)
          }
        }
        (qid, nh, rTot, math.round(sp.toDouble / math.min(rTot, 10L)))
      }
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_map")(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected, s"got $got expected $expected")
  }
}
