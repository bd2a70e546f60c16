package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Independent local reimplementations (plain Scala, no Spark operators)
  * of the round-9 additions — the MlFitSpec golden pattern: recompute the
  * full result on collected sf0.001 rows and compare row-for-row, so the
  * distributed formulation is checked against straight-line scalar code
  * in addition to the DuckDB oracle. */
class SelectionSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def toks(text: String): Array[String] =
    text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)

  test("q_dsir matches a straight-line scalar reimplementation") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, d, "documents")
      .select($"doc_id", $"source", $"text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // (doc, source, bucket) occurrences over hashed bigrams
    val occ = docs.flatMap { case (id, src, text) =>
      val t = toks(text)
      if (t.length < 2) Array.empty[(Long, String, Long)]
      else t.sliding(2).map { bg =>
        val b = java.lang.Long.parseLong(
          md5hex(bg(0) + " " + bg(1)).take(8), 16) % 64
        (id, src, b)
      }.toArray
    }
    val tgt = occ.filter(_._2 == "src0")
    val raw = occ.filter(_._2 != "src0")
    val tc = tgt.groupBy(_._3).map { case (b, v) => b -> v.length.toLong }
    val sc = raw.groupBy(_._3).map { case (b, v) => b -> v.length.toLong }
    val (nT, nS) = (tgt.length.toDouble, raw.length.toDouble)
    val lr6 = (0L until 64L).map { b =>
      val x = (tc.getOrElse(b, 0L).toDouble + 1.0) / (nT + 64.0) *
        ((nS + 64.0) / (sc.getOrElse(b, 0L).toDouble + 1.0))
      b -> BigDecimal(math.log(x) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.toMap
    val want = raw.groupBy(r => (r._1, r._2)).toSeq
      .map { case ((id, src), v) => (id, src, v.map(r => lr6(r._3)).sum) }
      .sortBy { case (id, _, w) => (-w, id) }
      .take(50)
    val got = SparkEntry.queries("q_dsir")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got === want)
  }

  test("q_learning_curve matches a per-row-residual scalar reimplementation") {
    import spark.implicits._
    // Independent formulation on BOTH axes: fits recomputed from raw
    // doubles (not integer sufficient stats), and held-out MSE as an
    // explicit per-row residual mean (not the expanded SSE identity).
    val rows = graft.Tables.load(spark, d, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        $"l_extendedprice")
      .collect()
      .map { r =>
        val bucket = java.lang.Long.parseLong(
          md5hex(r.getLong(0).toString + "-" + r.getInt(1).toString)
            .take(8), 16) % 100
        (bucket, r.getDouble(2).toLong, math.round(r.getDouble(3) * 100))
      }
    val test = rows.filter(_._1 >= 80)
    val got = SparkEntry.queries("q_learning_curve")(spark, d).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(20L, 40L, 60L, 80L, 100L))
    got.zip(Seq(16, 32, 48, 64, 80)).foreach { case (r, t) =>
      val tr = rows.filter(_._1 < t)
      assert(r.getLong(1) === tr.length.toLong)
      val n = tr.length.toDouble
      val (sx, sy) = (tr.map(_._2).sum.toDouble, tr.map(_._3).sum.toDouble)
      val sxx = tr.map(v => v._2 * v._2).sum.toDouble
      val sxy = tr.map(v => v._2 * v._3).sum.toDouble
      val b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val b0 = (sy - b1 * sx) / n
      val mse = test.map { case (_, x, y) =>
        val e = y - b0 - b1 * x; e * e
      }.sum / test.length / 10000.0
      // Micro-unit BIGINT outputs (x * 1e6 integer space); tolerances
      // are the old double tolerances scaled into micro-units.
      assert(math.abs(r.getAs[Long]("slope_micro") - b1 * 10000.0) < 10.0)
      assert(math.abs(
        r.getAs[Long]("intercept_micro") - b0 * 10000.0) < 100.0)
      assert(math.abs(r.getAs[Long]("mse_micro") - mse * 1e6) <
        1e-6 * math.max(1.0, mse) * 1e6 + 1.0)
    }
  }

  test("q_tpch_q18 matches a straight-line scalar reimplementation") {
    import spark.implicits._
    def dec2(x: Double): BigDecimal = BigDecimal(x).setScale(2)
    val li = graft.Tables.load(spark, d, "lineitem")
      .select($"l_orderkey", $"l_quantity").collect()
      .map(r => (r.getLong(0), dec2(r.getDouble(1))))
    val orders = graft.Tables.load(spark, d, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2), r.getDouble(3)))
    val cust = graft.Tables.load(spark, d, "customer")
      .select($"c_custkey", $"c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val qsum = li.groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._2).sum
    }
    val bigKeys = qsum.filter(_._2 > BigDecimal(300)).keySet
    val want = orders.filter(o => bigKeys.contains(o._1))
      .map { case (ok, ck, od, tp) =>
        (cust(ck), ck, ok, od, tp, qsum(ok).toDouble)
      }
      .sortBy { case (_, _, ok, od, tp, _) =>
        (-tp, od.toInstant(java.time.ZoneOffset.UTC).toEpochMilli, ok)
      }
      .take(100).toSeq
    val got = SparkEntry.queries("q_tpch_q18")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getAs[java.time.LocalDateTime](3), r.getDouble(4),
        r.getDouble(5)))
      .toSeq
    assert(got === want)
  }

  test("q_pass_at_k matches an exact-BigInt combinatorial " +
      "reimplementation") {
    import spark.implicits._
    // success predicate + grouping recomputed from raw events; pass@k
    // from EXACT BigInt binomials (not the query's double fold), so the
    // fold's arithmetic is checked against the true estimator
    val ev = graft.Tables.load(spark, d, "events")
      .select($"event_id", $"user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byTask = ev.groupBy(_._2).map { case (task, rows) =>
      val n = rows.length
      val c = rows.count { case (eid, _) =>
        java.lang.Long.parseLong(md5hex(eid.toString).take(8), 16) % 5 == 0
      }
      (task, n, c)
    }.filter(_._2 >= 10).toSeq
    def choose(n: Int, k: Int): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (0 until k).foldLeft(BigInt(1))((a, i) => a * (n - i) / (i + 1))
    def passAtK(n: Int, c: Int, k: Int): Double =
      if (n - c < k) 1.0
      else 1.0 - (BigDecimal(choose(n - c, k)) /
        BigDecimal(choose(n, k))).toDouble
    val got = SparkEntry.queries("q_pass_at_k")(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(1, 5, 10))
    got.foreach { case (k, nTasks, meanMicro) =>
      assert(nTasks == byTask.size.toLong)
      val want = byTask.map { case (_, n, c) =>
        math.round(passAtK(n, c, k) * 1e6).toDouble
      }.sum / byTask.size
      // the query's per-factor double fold vs the exact rational: each
      // task can differ by <1 micro-unit of rounding; the mean by less
      assert(math.abs(meanMicro - want) <= 2.0,
        s"k=$k got=$meanMicro want=$want")
    }
  }

  test("q_bradley_terry matches a scalar two-round MM reimplementation") {
    import spark.implicits._
    val li = graft.Tables.load(spark, d, "lineitem")
      .join(org.apache.spark.sql.functions.broadcast(
        graft.Tables.load(spark, d, "part")),
        $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice",
        $"p_brand")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3)))
    // pair rule mirrors the query: STRICT line-number inequality (the
    // synthetic table reuses line numbers within an order; same-number
    // lines are parallel entries and do not pair with each other)
    val pairs = li.toSeq.groupBy(_._1).values.toSeq.flatMap { g =>
      for {
        a <- g; b <- g if a._2 < b._2
        if a._4 != b._4 && a._3 != b._3
      } yield (a._4, b._4, a._3 > b._3)
    }
    val dirAll = pairs.flatMap { case (i, j, aw) =>
      Seq((i, j, if (aw) 1L else 0L), (j, i, if (aw) 0L else 1L))
    }
    val ij = dirAll.groupBy(p => (p._1, p._2)).map { case ((i, j), g) =>
      (i, j, g.size.toLong, g.map(_._3).sum)
    }.toSeq
    val tot = ij.groupBy(_._1).map { case (i, g) =>
      i -> (g.map(_._3).sum, g.map(_._4).sum)
    }
    val s1m = tot.map { case (i, (n, w)) =>
      i -> math.round(2.0 * w / n * 1e6)
    }
    val s2 = tot.map { case (i, (_, w)) =>
      val den = ij.filter(_._1 == i)
        .map(e => e._3.toDouble * 1e6 / (s1m(i) + s1m(e._2)).toDouble).sum
      i -> math.round(w.toDouble / den * 1e6)
    }
    val got = SparkEntry.queries("q_bradley_terry")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == s2.size)
    got.foreach { case (brand, n, w, s2m) =>
      assert((n, w) == (tot(brand)._1, tot(brand)._2), brand)
      // the engine's den-sum order may differ from this fold's: +-1 micro
      assert(math.abs(s2m - s2(brand)) <= 1L, s"$brand $s2m ${s2(brand)}")
    }
  }
}
