package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Golden recounts for the round-13 additions (q_kcore,
  * q_link_predict, q_atkinson, q_ipw, q_granger, q_boilerplate,
  * q_ppl_bucket): each statistic recomputed INDEPENDENTLY in plain
  * Scala from the raw sf0.001 rows — driver-side peeling, BigDecimal
  * 9-dp frozen sums, and the same left-to-right closed forms. Also the
  * thin-panel regression for the ADVICE r12 fix: MMR/FPS on a panel
  * smaller than k must emit fewer rows, not throw. */
class GraphCausalSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  private lazy val rawPairs: Seq[(String, String)] =
    graft.Tables.load(spark, d, "orders")
      .select($"o_orderkey", $"o_custkey")
      .join(graft.Tables.load(spark, d, "lineitem")
        .select($"l_orderkey".as("o_orderkey"), $"l_suppkey"),
        "o_orderkey")
      .select(org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("c"), $"o_custkey"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("s"), $"l_suppkey"))
      .as[(String, String)].collect().toSeq

  /** q_pagerank-family edge set: distinct trade pairs. */
  private lazy val edges: Set[(String, String)] = rawPairs.toSet

  /** q_kcore edge set: repeat-trade pairs (>= 2 line items).
    * filter + keySet, NOT Map.collect returning the pair — that
    * overload rebuilds a Map keyed by the pair's first element and
    * silently deduplicates to one edge per customer. */
  private lazy val repeatEdges: Set[(String, String)] =
    rawPairs.groupBy(identity).filter(_._2.size >= 2).keySet

  test("q_kcore matches a driver-side peeling recount " +
    "(monotone profile, fixpoint at sf0.001)") {
    var e = repeatEdges
    val expect = scala.collection.mutable.ArrayBuffer(
      (0L, e.map(_._1).size.toLong, e.map(_._2).size.toLong,
        e.size.toLong))
    for (i <- 1 to 8) {
      val cd = e.groupBy(_._1).map { case (k, v) => k -> v.size }
      val sd = e.groupBy(_._2).map { case (k, v) => k -> v.size }
      e = e.filter(p => cd(p._1) >= 3 && sd(p._2) >= 3)
      expect += ((i.toLong, e.map(_._1).size.toLong,
        e.map(_._2).size.toLong, e.size.toLong))
    }
    val got = q("q_kcore")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expect.toSeq)
    assert(got.sliding(2).forall(w => w(1)._4 <= w(0)._4),
      "peel profile must be monotone nonincreasing")
    // convergence inside 8 rounds is a property of the generated
    // data, not of the operator (the contract is the bounded profile,
    // not a fixpoint) — report it informationally instead of failing
    // the suite if the testdata is ever regenerated with a deeper
    // cascade
    if (expect(7)._4 != expect(8)._4)
      info(s"peel still shaving at round 8 at sf0.001 " +
        s"(${expect(7)._4} -> ${expect(8)._4}) — data-distribution " +
        "assumption no longer holds; profile equality above still " +
        "fully pins correctness")
  }

  test("q_link_predict matches a brute-force Adamic-Adar recount") {
    // numeric supplier keys, nano-frozen terms — the query's hot-path
    // representation; prefixes land on the output rows only
    val numEdges = edges.map(p => (p._1, p._2.drop(1).toLong))
    val cdeg = numEdges.groupBy(_._1).map { case (k, v) => k -> v.size }
      .filter { case (_, n) => n >= 2 && n <= Graph.MaxCustDeg }
    val kept = numEdges.filter(p => cdeg.contains(p._1))
    val sdeg = kept.groupBy(_._2).map { case (k, v) => k -> v.size }
    val byCust = kept.groupBy(_._1)
      .map { case (c, es) => c -> es.map(_._2).toSeq.sorted }
    val pairAgg = scala.collection.mutable
      .Map.empty[(Long, Long), (Long, Long)]
    for ((c, ss) <- byCust; i <- ss.indices; j <- (i + 1) until ss.size) {
      val key = (ss(i), ss(j))
      val (n, aa) = pairAgg.getOrElse(key, (0L, 0L))
      pairAgg(key) = (n + 1,
        aa + math.round(1.0 / math.log(cdeg(c).toDouble) * 1e9))
    }
    val expect = pairAgg.toSeq.map { case ((k1, k2), (n, aa)) =>
      val jac = math.round(n.toDouble /
        (sdeg(k1) + sdeg(k2) - n).toDouble * 1e6)
      (s"s$k1", s"s$k2", n, math.round(aa.toDouble / 1000.0), jac)
    }.sortBy { case (s1, s2, _, aam, _) => (-aam, s1, s2) }.take(20)
    val got = q("q_link_predict")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == expect)
  }

  test("q_atkinson matches a BigDecimal frozen-ln recount") {
    val cust = graft.Tables.load(spark, d, "orders")
      .groupBy($"o_custkey")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.expr(
          "CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("x"))
      .join(graft.Tables.load(spark, d, "customer")
        .select($"c_custkey", $"c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".cast("long"), $"x")
      .as[(Long, Long)].collect().toSeq
    val nations = graft.Tables.load(spark, d, "nation")
      .select($"n_nationkey".cast("long"), $"n_name")
      .as[(Long, String)].collect().toMap
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expect = cust.groupBy(_._1).toSeq.map { case (nk, xs) =>
      val n = xs.size.toLong
      val sx = xs.map(_._2).sum
      val sl = xs.map(v => r9(math.log(v._2.toDouble))).sum
      val a = 1.0 - math.exp(sl.toDouble / n.toDouble -
        math.log(sx.toDouble / n.toDouble))
      (nations(nk), n, sx, math.round(a * 1e6))
    }.sortBy(_._1)
    val got = q("q_atkinson")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == expect)
  }

  test("q_granger matches a closed-form recount within 1 micro") {
    val day = graft.Tables.load(spark, d, "events")
      .groupBy(org.apache.spark.sql.functions.to_date($"ts").as("day"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("x"),
        org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.when(
              $"event_type" === "purchase",
              org.apache.spark.sql.functions.expr(
                "CAST(round(value * 1000000.0, 0) AS BIGINT)"))),
          org.apache.spark.sql.functions.lit(0L)).as("y"))
      .select($"day".cast("string"), $"x", $"y")
      .as[(String, Long, Long)].collect()
      .map { case (dy, x, y) =>
        java.time.LocalDate.parse(dy) -> (x, y) }.toMap
    val pairs = day.toSeq.flatMap { case (dy, (_, y)) =>
      day.get(dy.minusDays(1)).map { case (x1, y1) => (y, y1, x1) } }
    val n = pairs.size.toDouble
    def s(f: ((Long, Long, Long)) => BigInt): BigInt =
      pairs.map(f).sum
    val (sy, sy1, sx1) = (s(p => BigInt(p._1)), s(p => BigInt(p._2)),
      s(p => BigInt(p._3)))
    val syy = s(p => BigInt(p._1) * BigInt(p._1))
    val syy1 = s(p => BigInt(p._1) * BigInt(p._2))
    val syx1 = s(p => BigInt(p._1) * BigInt(p._3))
    val sy1y1 = s(p => BigInt(p._2) * BigInt(p._2))
    val sy1x1 = s(p => BigInt(p._2) * BigInt(p._3))
    val sx1x1 = s(p => BigInt(p._3) * BigInt(p._3))
    def c(sab: BigInt, sa: BigInt, sb: BigInt) =
      sab.toDouble - sa.toDouble * sb.toDouble / n
    val (c11, c22, c12) = (c(sy1y1, sy1, sy1), c(sx1x1, sx1, sx1),
      c(sy1x1, sy1, sx1))
    val (c1y, c2y, cyy) = (c(syy1, sy, sy1), c(syx1, sy, sx1),
      c(syy, sy, sy))
    val det = c11 * c22 - c12 * c12
    val b1 = (c1y * c22 - c2y * c12) / det
    val b2 = (c2y * c11 - c1y * c12) / det
    val ssrU = cyy - b1 * c1y - b2 * c2y
    val ssrR = cyy - c1y * c1y / c11
    val f = (ssrR - ssrU) / (ssrU / (n - 3))
    val got = q("q_granger")
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().head
    assert(got._1 == pairs.size.toLong)
    assert(math.abs(got._2.get - math.round(b2)) <= 1)
    assert(math.abs(got._3.get - math.round(f * 1e6)) <= 1)
    assert(math.abs(got._4.get -
      math.round((ssrR - ssrU) / cyy * 1e6)) <= 1)
  }

  test("q_ipw matches a BigDecimal per-stratum recount within 1 micro") {
    val users = graft.Tables.load(spark, d, "events")
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("score"),
        org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.when(
              $"event_type" === "purchase",
              org.apache.spark.sql.functions.expr(
                "CAST(round(value * 1000000.0, 0) AS BIGINT)"))),
          org.apache.spark.sql.functions.lit(0L)).as("y6"),
        org.apache.spark.sql.functions.pmod($"user_id",
          org.apache.spark.sql.functions.lit(2L)).as("arm"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    case class A(nc: Long, syc: Long, nt: Long, syt: Long)
    val strata = users.groupBy(_._2).values.map { g =>
      A(g.count(_._4 == 0L), g.filter(_._4 == 0L).map(_._3).sum,
        g.count(_._4 == 1L), g.filter(_._4 == 1L).map(_._3).sum)
    }.toSeq
    var (sht, swt, swc, sst, ssc, swt2) =
      (BigDecimal(0), BigDecimal(0), BigDecimal(0), BigDecimal(0),
        BigDecimal(0), BigDecimal(0))
    var nClip = 0L
    for (a <- strata) {
      val raw = a.nt.toDouble / (a.nc + a.nt).toDouble
      if (raw < 0.1 || raw > 0.9) nClip += 1
      val e = math.min(math.max(raw, 0.1), 0.9)
      sht += r9(a.syt.toDouble / e - a.syc.toDouble / (1.0 - e))
      swt += r9(a.nt.toDouble / e)
      swc += r9(a.nc.toDouble / (1.0 - e))
      sst += r9(a.syt.toDouble / e)
      ssc += r9(a.syc.toDouble / (1.0 - e))
      swt2 += r9(a.nt.toDouble / (e * e))
    }
    val nU = users.size.toLong
    val got = q("q_ipw")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got._1 == nU && got._2 == strata.size.toLong &&
      got._3 == nClip)
    assert(math.abs(got._4 -
      math.round(sht.toDouble / nU.toDouble)) <= 1)
    assert(math.abs(got._5 - math.round(sst.toDouble / swt.toDouble -
      ssc.toDouble / swc.toDouble)) <= 1)
    assert(math.abs(got._6 - math.round(swt.toDouble * swt.toDouble /
      swt2.toDouble * 1e6)) <= 1)
  }

  test("q_boilerplate matches a brute-force 5-gram recount") {
    val ds = graft.Tables.load(spark, d, "documents")
      .select($"doc_id", $"source", $"text")
      .as[(String, String, String)].collect().toSeq
    def grams(t: String): Set[String] = {
      val toks = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < 5) Set.empty
      else toks.sliding(5).map(_.mkString(" ")).toSet
    }
    val perDoc = ds.map { case (id, src, t) => (id, src, grams(t)) }
      .filter(_._3.nonEmpty)
    val df = perDoc.flatMap(p => p._3.map(_ -> p._1))
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet.size }
    val bp = df.filter(_._2 >= 10).keySet
    val expect = perDoc.groupBy(_._2).toSeq.map { case (src, docs) =>
      val nG = docs.map(_._3.size.toLong).sum
      val nBp = docs.map(_._3.count(bp.contains).toLong).sum
      (src, docs.size.toLong, nG, nBp,
        math.round(nBp.toDouble / nG.toDouble * 1e6))
    }.sortBy(_._1)
    val got = q("q_boilerplate")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expect)
  }

  test("q_ppl_bucket partitions every scored doc across the terciles") {
    val got = q("q_ppl_bucket")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got.forall(r => Set("head", "middle", "tail")(r._2)))
    val nScored = graft.Tables.load(spark, d, "documents")
      .select(graft.Fns.tokens($"text").as("t"))
      .filter(org.apache.spark.sql.functions.size($"t") >= 2)
      .count()
    assert(got.map(_._3).sum == nScored)
    // terciles: no bucket holds more than half the corpus
    val byBucket = got.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    assert(byBucket.values.forall(_ <= nScored / 2 + 1))
  }

  test("MMR and FPS degrade to fewer picks on a thin panel " +
    "(ADVICE r12: no crash below k)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_thin_panel").toString
    val rng = new scala.util.Random(7)
    val rows = (0L to 3L).map(i =>
      (i, Array.fill(8)(rng.nextFloat()), i % 2))
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // 4 vectors: MMR candidate panel (vec_id >= 8) is EMPTY -> 0 rows
    assert(SparkEntry.queries("q_mmr_select")(spark, dir).count() == 0L)
    // FPS panel has 4 ids -> exactly 4 picks, not 8
    assert(SparkEntry.queries("q_fps_sample")(spark, dir).count() == 4L)
  }
}
