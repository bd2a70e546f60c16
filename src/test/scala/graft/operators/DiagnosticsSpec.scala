package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Independent plain-Scala recounts for the round-15 operators — the
  * oracle gate proves Spark ≡ DuckDB; these prove both equal the
  * textbook formula computed from scratch on collected rows. */
class DiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  /** (custkey, mktsegment, acctbal cents + 1e5 shift, spend cents). */
  private lazy val custRows: Seq[(Long, String, Long, Long)] = {
    val spend = spark.read.parquet(s"$d/orders.parquet")
      .groupBy($"o_custkey")
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .as("yc"))
      .as[(Long, Long)].collect().toMap
    spark.read.parquet(s"$d/customer.parquet")
      .select($"c_custkey", $"c_mktsegment",
        expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)"))
      .as[(Long, String, Long)].collect().toSeq
      .map(r => (r._1, r._2, r._3 + 100000L, spend.getOrElse(r._1, 0L)))
  }

  test("q_psm_att matches a from-scratch greedy-with-replacement " +
    "caliper matching on collected rows") {
    val treated = custRows.filter(_._2 == "BUILDING")
    val controls = custRows.filter(_._2 != "BUILDING")
    val matched = treated.flatMap { t =>
      val cands = controls.filter(c => math.abs(t._3 - c._3) <= 5000L)
      if (cands.isEmpty) None
      else {
        val best = cands.minBy(c => (math.abs(t._3 - c._3), c._1))
        Some(t._4 - best._4)
      }
    }
    val att = math.round(matched.map(BigInt(_)).sum.toDouble /
      matched.size)
    val row = SparkEntry.queries("q_psm_att")(spark, d)
      .as[(Long, Long, Long)].collect().head
    assert(row == ((treated.size.toLong, matched.size.toLong, att)))
    // the caliper must actually bind SOMEWHERE (else the unmatched
    // path is never exercised): at sf0.001 the balance grid is ~7x
    // sparser, so some treated customers stay unmatched there
    val tiny = SparkEntry.queries("q_psm_att")(
      spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect().head
    assert(tiny._2 < tiny._1, s"caliper never binds at sf0.001: $tiny")
  }

  test("q_drawdown matches a sequential in-memory scan per segment") {
    val daily = spark.read.parquet(s"$d/orders.parquet")
      .join(spark.read.parquet(s"$d/customer.parquet"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", to_date($"o_orderdate").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .as("rev"))
      .as[(String, java.sql.Date, Long)].collect()
    val want = daily.groupBy(_._1).map { case (seg, rows) =>
      var cum = 0L; var peak = 0L
      var best = -1L; var bestDay: java.sql.Date = null
      rows.sortBy(_._2.toString).foreach { r =>
        cum += r._3; peak = math.max(peak, cum)
        val dd = peak - cum
        if (dd > best) { best = dd; bestDay = r._2 }
      }
      seg -> ((rows.length.toLong, best, bestDay))
    }
    val got = SparkEntry.queries("q_drawdown")(spark, d)
      .as[(String, Long, Long, java.sql.Date)].collect()
    assert(got.length == want.size)
    got.foreach { g =>
      val w = want(g._1)
      assert((g._2, g._3, g._4.toString) == ((w._1, w._2, w._3.toString)),
        s"segment ${g._1}: got $g want $w")
    }
  }

  test("q_cvm matches a from-scratch ECDF sum over collected values") {
    val vals = spark.read.parquet(s"$d/events.parquet")
      .filter($"value".isNotNull)
      .select(pmod($"user_id", lit(2L)),
        expr("CAST(round(value * 100, 0) AS BIGINT)"))
      .as[(Long, Long)].collect()
    val a = vals.filter(_._1 == 0L).map(_._2)
    val b = vals.filter(_._1 == 1L).map(_._2)
    val n = a.length.toLong; val m = b.length.toLong
    val cntA = a.groupBy(identity).view.mapValues(_.length).toMap
    val cntB = b.groupBy(identity).view.mapValues(_.length).toMap
    val grid = (a ++ b).distinct.sorted
    var t = BigInt(0); var ca = 0L; var cb = 0L
    grid.foreach { v =>
      val av = cntA.getOrElse(v, 0); val bv = cntB.getOrElse(v, 0)
      ca += av; cb += bv
      val diff = BigInt(ca) * m - BigInt(cb) * n
      t += BigInt(av + bv) * diff * diff
    }
    val omega = t.toDouble / (n.toDouble * m.toDouble *
      (n + m).toDouble * (n + m).toDouble)
    val row = SparkEntry.queries("q_cvm")(spark, d)
      .as[(Long, Long, Long, Boolean)].collect().head
    assert((row._1, row._2) == ((n, m)))
    assert(row._3 == math.round(omega * 1e6),
      s"cvm ${row._3} vs recount ${math.round(omega * 1e6)}")
  }

  test("q_rbo matches a from-scratch prefix-overlap sum over the two " +
    "top-20 lists") {
    def top20(pre: Boolean): Seq[Long] = {
      val cond =
        if (pre) $"l_shipdate" < lit("1998-01-01").cast("timestamp")
        else $"l_shipdate" >= lit("1998-01-01").cast("timestamp")
      spark.read.parquet(s"$d/lineitem.parquet").filter(cond)
        .groupBy($"l_partkey")
        .agg(sum(expr("CAST(round(l_extendedprice * 100, 0) AS " +
          "BIGINT)")).as("rev"))
        .as[(Long, Long)].collect().toSeq
        .sortBy(r => (-r._2, r._1)).take(20).map(_._1)
    }
    val la = top20(pre = true); val lb = top20(pre = false)
    val terms = (1 to 20).map { dd =>
      val x = la.take(dd).toSet.intersect(lb.take(dd).toSet).size
      math.round(x.toDouble / dd / math.pow(2.0, dd) * 1e9)
    }
    val overlap20 = la.toSet.intersect(lb.toSet).size.toLong
    val row = SparkEntry.queries("q_rbo")(spark, d)
      .as[(Long, Long)].collect().head
    assert(row == ((overlap20, terms.sum)),
      s"got $row want ($overlap20, ${terms.sum})")
  }

  test("q_price_index: Fisher sits between Laspeyres and Paasche " +
    "(or at them), all positive on this corpus") {
    val r = SparkEntry.queries("q_price_index")(spark, d)
      .as[(Long, Long, Long, Long)].collect().head
    assert(r._1 > 0L)
    val (l, p, f) = (r._2, r._3, r._4)
    assert(l > 0L && p > 0L && f > 0L)
    assert(f >= math.min(l, p) - 1 && f <= math.max(l, p) + 1,
      s"fisher $f outside [$l, $p]")
  }

  test("q_moran_i matches a from-scratch weighted recount and its " +
    "expectation is -1/(n-1)") {
    val nat = spark.read.parquet(s"$d/orders.parquet")
      .join(spark.read.parquet(s"$d/customer.parquet"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey")
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .as("x"))
      .as[(Int, Long)].collect()
    val n = nat.length
    val xbar = nat.map(r => BigDecimal(r._2)).sum / n
    val dev = nat.map(r => (r._1 / 5, BigDecimal(r._2) - xbar))
    var num = BigDecimal(0); var w = 0L
    for (i <- dev.indices; j <- dev.indices if i != j
         if dev(i)._1 == dev(j)._1) {
      num += dev(i)._2 * dev(j)._2; w += 1
    }
    val den = dev.map(v => v._2 * v._2).sum
    val want = math.round(
      (n.toDouble / w) * (num / den).toDouble * 1e6)
    val row = SparkEntry.queries("q_moran_i")(spark, d)
      .as[(Long, Long, Long, Long)].collect().head
    assert(row._1 == n.toLong && row._2 == w)
    assert(math.abs(row._3 - want) <= 1L,
      s"moran ${row._3} vs recount $want")
    assert(row._4 == math.round(-1e6 / (n - 1)))
  }

  test("q_mood_median matches a from-scratch grand-median recount") {
    val ev = spark.read.parquet(s"$d/events.parquet")
      .filter($"value".isNotNull)
      .select($"event_type",
        expr("CAST(round(value * 100, 0) AS BIGINT)"))
      .as[(String, Long)].collect()
    val sorted = ev.map(_._2).sorted
    val nTot = sorted.length
    // smallest grid value with 2*cum >= N
    val med = sorted(((nTot + 1) / 2) - 1)
    val groups = ev.groupBy(_._1)
    val cells = groups.map { case (_, rows) =>
      (rows.count(_._2 > med).toLong, rows.count(_._2 <= med).toLong)
    }.toSeq
    val ta = cells.map(_._1).sum; val tb = cells.map(_._2).sum
    val nn = (ta + tb).toDouble
    val s9 = cells.map { case (a, b) =>
      math.round(a.toDouble * a / (a + b) * 1e9)
    }.sum
    val chi2 = nn * nn / (ta.toDouble * tb) *
      (s9 / 1e9 - ta.toDouble * ta / nn)
    val row = SparkEntry.queries("q_mood_median")(spark, d)
      .as[(Long, Long, Long, Boolean)].collect().head
    assert(row._1 == groups.size.toLong && row._2 == nTot.toLong)
    assert(math.abs(row._3 - math.round(chi2 * 1e6)) <= 1L,
      s"mood ${row._3} vs recount ${math.round(chi2 * 1e6)}")
  }

  test("q_cochran_armitage matches the closed-form recount on " +
    "collected level counts") {
    val g = spark.read.parquet(s"$d/lineitem.parquet")
      .groupBy($"l_quantity".cast("bigint"))
      .agg(count(lit(1)), sum(($"l_returnflag" === "R").cast("long")))
      .as[(Long, Long, Long)].collect()
    val n = g.map(_._2).sum.toDouble; val r = g.map(_._3).sum.toDouble
    val p = r / n
    val ss = g.map(x => x._1 * x._2).sum.toDouble
    val srs = g.map(x => x._1 * x._3).sum.toDouble
    val sns2 = g.map(x => x._1 * x._1 * x._2).sum.toDouble
    val z2 = math.pow(srs - p * ss, 2) /
      (p * (1 - p) * (sns2 - ss * ss / n))
    val row = SparkEntry.queries("q_cochran_armitage")(spark, d)
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(math.abs(row._4 - math.round(z2 * 1e6)) <= 1L,
      s"ca ${row._4} vs recount ${math.round(z2 * 1e6)}")
  }

  test("q_neyman_alloc: weights proportional to N_h*sigma_h and the " +
    "floor split never exceeds the budget") {
    val rows = SparkEntry.queries("q_neyman_alloc")(spark, d)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length == 5 && rows.forall(_._4 >= 0L))
    assert(rows.map(_._4).sum <= 1000L)
    // rank order of allocations matches rank order of n*sigma
    val byW = rows.sortBy(r => r._2 * r._3)
    assert(byW.map(_._4).sorted.sameElements(byW.map(_._4)),
      s"allocation not monotone in N*sigma: ${rows.mkString(", ")}")
  }
}
