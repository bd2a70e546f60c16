package graft.operators

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.{DataFrame, Row}

/** r14 ADVICE regression battery: every division in the fit/causal tier
  * must emit NULL — never NaN/Inf — on a degenerate corpus, because
  * Spark CASTs NaN to 0 where DuckDB's CAST(round(NaN)) errors, so a
  * NaN anywhere is a silent cross-engine divergence waiting for a
  * different data distribution. Each test materializes a tiny parquet
  * corpus that triggers the degenerate branch and asserts the query
  * returns its documented NULL/empty-row contract instead of crashing
  * or fabricating a 0. */
class DegenerateGuardSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDir(tables: (String, DataFrame)*): String = {
    val d = Files.createTempDirectory("graft_degen").toString
    tables.foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$d/$n.parquet")
    }
    d
  }

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  test("q_cv_kfold: zero train-side x-variance yields NULL fits, " +
    "not NaN->0") {
    // every row has the same l_quantity, so each fold's train moments
    // have rn*rsxx - rsx^2 = 0 exactly
    val li = (1L to 50L).map(k => (k, 1L, 7.0, 100.0 + k))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val d = corpusDir("lineitem" -> li)
    val rows = SparkEntry.queries("q_cv_kfold")(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("slope_micro")),
        s"slope must be NULL on a zero-variance train set: $r")
      assert(r.isNullAt(r.fieldIndex("intercept_micro")), s"$r")
      assert(r.isNullAt(r.fieldIndex("mse_micro")), s"$r")
      assert(!r.isNullAt(r.fieldIndex("n_test")),
        s"fold counts must survive the NULL fit: $r")
    }
  }

  test("q_logistic: one-cell quantity grid (singular Hessian) yields " +
    "NULL coefficients, not NaN->0") {
    val li = (1L to 40L).map(k =>
      (k, 7.0, if (k % 3 == 0) "R" else "N"))
      .toDF("l_orderkey", "l_quantity", "l_returnflag")
    val d = corpusDir("lineitem" -> li)
    val rows = SparkEntry.queries("q_logistic")(spark, d).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_cells") == 1L)
    assert(r.getAs[Long]("n") == 40L)
    assert(r.isNullAt(r.fieldIndex("b0_micro")),
      s"singular step-1 Hessian must yield NULL b0: $r")
    assert(r.isNullAt(r.fieldIndex("b1_micro")), s"$r")
  }

  test("q_join_skew_audit: an EMPTY audited table still emits its row " +
    "(n_keys = 0, NULL stats) like the oracle's per-table aggs") {
    val li = Seq.empty[Long].toDF("l_orderkey")
    val ord = Seq(1L, 1L, 2L).toDF("o_custkey")
    val ev = Seq((10L, ts("2024-01-20 00:00:00")),
      (10L, ts("2024-01-21 00:00:00")), (11L, ts("2024-01-22 00:00:00")))
      .toDF("user_id", "ts")
    val d = corpusDir("lineitem" -> li, "orders" -> ord, "events" -> ev)
    val rows = SparkEntry.queries("q_join_skew_audit")(spark, d)
      .collect()
    assert(rows.length == 3,
      s"all three audited keys must appear: ${rows.toSeq}")
    val byKey = rows.map(r => r.getAs[String]("join_key") -> r).toMap
    val lr = byKey("lineitem.l_orderkey")
    assert(lr.isNullAt(lr.fieldIndex("n_rows")), s"$lr")
    assert(lr.getAs[Long]("n_keys") == 0L, s"$lr")
    assert(lr.isNullAt(lr.fieldIndex("max_key_rows")), s"$lr")
    assert(lr.isNullAt(lr.fieldIndex("max_key_share")), s"$lr")
    assert(lr.isNullAt(lr.fieldIndex("skew_ratio")), s"$lr")
    assert(byKey("orders.o_custkey").getAs[Long]("n_rows") == 3L)
    assert(byKey("events.user_id").getAs[Long]("n_keys") == 2L)
  }

  test("q_event_study: a corpus with no base-week (rw = -1) events " +
    "yields NULL-normalized effect rows, not an empty result") {
    // all events are >= 2 weeks after the 2024-01-15 cutover, so the
    // rw = -1 base week has no rows at all
    val ev = Seq(
      (1L, ts("2024-02-01 10:00:00"), "view", 5.0),
      (2L, ts("2024-02-02 10:00:00"), "view", 7.0),
      (3L, ts("2024-02-09 10:00:00"), "view", 6.0),
      (4L, ts("2024-02-10 10:00:00"), "view", 9.0))
      .toDF("user_id", "ts", "event_type", "value")
    val d = corpusDir("events" -> ev)
    val rows = SparkEntry.queries("q_event_study")(spark, d).collect()
    assert(rows.nonEmpty,
      "the effect path must not vanish when the base week is missing")
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("effect_micro")),
        s"missing base week must NULL the normalized effect: $r")
      assert(!r.isNullAt(r.fieldIndex("gap_micro")),
        s"raw per-week gaps must survive: $r")
    }
  }

  test("q_mmd: an empty parity half yields NULL mmd2, not Inf/NaN") {
    // only even vec_ids exist -> ny = 0; 64-dim vectors as in testdata
    val emb = (0L to 6L by 2).map(v =>
      (v, Array.tabulate(64)(i => (0.01f * ((v + i) % 7)))))
      .toDF("vec_id", "embedding")
    val d = corpusDir("embeddings" -> emb)
    val rows = SparkEntry.queries("q_mmd")(spark, d).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_even") == 4L, s"$r")
    assert(r.getAs[Long]("n_odd") == 0L, s"$r")
    assert(r.isNullAt(r.fieldIndex("mmd2_nano")),
      s"empty odd half must yield NULL mmd2: $r")
    assert(r.isNullAt(r.fieldIndex("mean_part_nano")), s"$r")
  }

  test("healthy corpus sanity: the five guarded queries still return " +
    "non-NULL statistics at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val cv = SparkEntry.queries("q_cv_kfold")(spark, d).collect()
    assert(cv.length == 5 &&
      cv.forall(r => !r.isNullAt(r.fieldIndex("slope_micro"))))
    val lg = SparkEntry.queries("q_logistic")(spark, d).collect().head
    assert(!lg.isNullAt(lg.fieldIndex("b0_micro")))
    val js = SparkEntry.queries("q_join_skew_audit")(spark, d).collect()
    assert(js.length == 3 &&
      js.forall(r => !r.isNullAt(r.fieldIndex("skew_ratio"))))
    val es = SparkEntry.queries("q_event_study")(spark, d).collect()
    assert(es.nonEmpty &&
      es.forall(r => !r.isNullAt(r.fieldIndex("effect_micro"))))
    val mm = SparkEntry.queries("q_mmd")(spark, d).collect().head
    assert(!mm.isNullAt(mm.fieldIndex("mmd2_nano")))
  }

  // ---- round-15 operators: every degenerate branch fires NULL ----

  test("q_adf: a sub-3-day series yields NULL stats") {
    val ord = Seq((ts("1995-01-01 00:00:00"), 10.0),
      (ts("1995-01-02 00:00:00"), 12.0))
      .toDF("o_orderdate", "o_totalprice")
    val d = corpusDir("orders" -> ord)
    val r = SparkEntry.queries("q_adf")(spark, d).collect().head
    assert(r.isNullAt(r.fieldIndex("gamma_micro")), s"$r")
    assert(r.isNullAt(r.fieldIndex("df_stat_micro")), s"$r")
    assert(r.isNullAt(r.fieldIndex("unit_root_05")), s"$r")
  }

  test("q_cvm: an empty arm yields NULL, not Inf->0") {
    // every user_id even -> arm 1 empty
    val ev = (1L to 20L).map(k =>
      (k * 2L, 1.0 + k, ts("2024-01-20 00:00:00")))
      .toDF("user_id", "value", "ts")
    val d = corpusDir("events" -> ev)
    val r = SparkEntry.queries("q_cvm")(spark, d).collect().head
    assert(r.getAs[Long]("nb") == 0L)
    assert(r.isNullAt(r.fieldIndex("cvm_micro")), s"$r")
    assert(r.isNullAt(r.fieldIndex("reject_05")), s"$r")
  }

  test("q_psm_att: no control inside the caliper yields zero matches " +
    "and NULL ATT (never a 0/0)") {
    // treated at balance 0, controls 10,000 dollars away (> 5,000-cent
    // caliper)
    val cust = Seq((1L, "BUILDING", 0.0), (2L, "AUTOMOBILE", 9000.0),
      (3L, "FURNITURE", 9000.0)).toDF(
      "c_custkey", "c_mktsegment", "c_acctbal")
    val ord = Seq((1L, 100.0), (2L, 50.0)).toDF(
      "o_custkey", "o_totalprice")
    val d = corpusDir("customer" -> cust, "orders" -> ord)
    val r = SparkEntry.queries("q_psm_att")(spark, d).collect().head
    assert(r.getAs[Long]("n_treated") == 1L)
    assert(r.getAs[Long]("n_matched") == 0L)
    assert(r.isNullAt(r.fieldIndex("att_cents")), s"$r")
  }

  test("q_chow: an empty period side yields NULL F") {
    val li = (1L to 30L).map(k =>
      (1.0 + (k % 5), 100.0 + k, ts("1995-06-01 00:00:00")))
      .toDF("l_quantity", "l_extendedprice", "l_shipdate")
    val d = corpusDir("lineitem" -> li)
    val r = SparkEntry.queries("q_chow")(spark, d).collect().head
    assert(r.getAs[Long]("n_post") == 0L)
    assert(r.isNullAt(r.fieldIndex("f_micro")), s"$r")
    assert(r.isNullAt(r.fieldIndex("break_05")), s"$r")
  }

  test("q_bartlett: a singleton group NULLs the statistic (its " +
    "variance is undefined)") {
    val ev = ((1L to 10L).map(k =>
      ("click", 1.0 + k, ts("2024-01-20 00:00:00"))) :+
      (("view", 5.0, ts("2024-01-20 00:00:00"))))
      .toDF("event_type", "value", "ts")
    val d = corpusDir("events" -> ev)
    val r = SparkEntry.queries("q_bartlett")(spark, d).collect().head
    assert(r.getAs[Long]("k") == 2L)
    assert(r.isNullAt(r.fieldIndex("bartlett_micro")), s"$r")
  }

  test("q_cochran_armitage: zero returns yield NULL (p(1-p) = 0)") {
    val li = (1L to 30L).map(k => (1.0 + (k % 5), "N"))
      .toDF("l_quantity", "l_returnflag")
    val d = corpusDir("lineitem" -> li)
    val r = SparkEntry.queries("q_cochran_armitage")(spark, d)
      .collect().head
    assert(r.getAs[Long]("n_return") == 0L)
    assert(r.isNullAt(r.fieldIndex("z2_micro")), s"$r")
  }

  test("q_fwl_within: constant treatment yields NULL betas in both " +
    "the within and pooled columns") {
    val cust = (1L to 20L).map(k => (k, (k % 4).toInt, 100.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val ord = (1L to 20L).map(k => (k, 50.0 + k))
      .toDF("o_custkey", "o_totalprice")
    val d = corpusDir("customer" -> cust, "orders" -> ord)
    val r = SparkEntry.queries("q_fwl_within")(spark, d).collect().head
    assert(r.isNullAt(r.fieldIndex("beta_within_micro")), s"$r")
    assert(r.isNullAt(r.fieldIndex("beta_pooled_micro")), s"$r")
  }

  test("q_price_index: disjoint part baskets yield an empty basket " +
    "and NULL indexes") {
    val li = Seq(
      (1L, 5.0, 10.0, ts("1995-06-01 00:00:00")),
      (2L, 5.0, 10.0, ts("1999-06-01 00:00:00")))
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_shipdate")
    val d = corpusDir("lineitem" -> li)
    val r = SparkEntry.queries("q_price_index")(spark, d).collect().head
    assert(r.getAs[Long]("n_parts") == 0L)
    assert(r.isNullAt(r.fieldIndex("laspeyres_micro")), s"$r")
    assert(r.isNullAt(r.fieldIndex("fisher_micro")), s"$r")
  }

  test("q_mood_median: a one-sided split (all mass at one value) " +
    "yields NULL chi-square") {
    // a single distinct value: nothing is strictly above the median,
    // so the ta margin is 0
    val ev = (1L to 12L).map(k =>
      (if (k % 2 == 0) "click" else "view", 7.0,
        ts("2024-01-20 00:00:00")))
      .toDF("event_type", "value", "ts")
    val d = corpusDir("events" -> ev)
    val r = SparkEntry.queries("q_mood_median")(spark, d).collect().head
    assert(r.isNullAt(r.fieldIndex("chi2_micro")), s"$r")
    assert(r.isNullAt(r.fieldIndex("reject_05")), s"$r")
  }

  test("q_moran_i: a single nation has no weighted pairs -> NULL I") {
    val cust = (1L to 5L).map(k => (k, 3)).toDF(
      "c_custkey", "c_nationkey")
    val ord = (1L to 5L).map(k => (k, 10.0 * k)).toDF(
      "o_custkey", "o_totalprice")
    val d = corpusDir("customer" -> cust, "orders" -> ord)
    val r = SparkEntry.queries("q_moran_i")(spark, d).collect().head
    assert(r.getAs[Long]("n_nations") == 1L)
    assert(r.getAs[Long]("w_pairs") == 0L)
    assert(r.isNullAt(r.fieldIndex("morans_i_micro")), s"$r")
    assert(r.isNullAt(r.fieldIndex("expected_micro")), s"$r")
  }
}
