package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experimentation-inference depth beyond the point tests the stats tier
  * already carries (q_ab_test, q_welch_t, q_srm, q_cuped, q_power_mde):
  * effect sizes with confidence intervals (odds ratio / relative risk),
  * association strength on contingency grids (Cramér's V), a full
  * Bayesian A/B readout from an exact fixed-grid posterior integration,
  * and always-valid sequential monitoring (mixture SPRT) — the four
  * readouts an experimentation platform serves AFTER the validity gates
  * pass.
  *
  * House determinism rules apply throughout: every transcendental result
  * is frozen at 9 dp before reuse, every accumulated float is frozen to
  * micro/picounits (BIGINT) before summation so cross-engine sums are
  * exact, decimal types stay INTERNAL (OutputSchemaSpec gate), and every
  * multi-row output is totally ordered. */
object Inference {

  /** Per-user conversion panel shared by the 2x2 queries: one row per
    * (arm, user), conv = user fired >= 1 'purchase' event. Arm is the
    * house A/B assignment (treated = odd user_id). One user-keyed
    * partial agg — the only corpus shuffle these queries do. */
  private def userConv(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.load(s, d, "events")
      .select(pmod($"user_id", lit(2L)).as("arm"), $"user_id",
        ($"event_type" === "purchase").cast("long").as("p"))
      .groupBy($"arm", $"user_id").agg(max($"p").as("conv"))
  }

  private val duckUserConv: String =
    """u AS (
      |  SELECT user_id % 2 AS arm, user_id,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS conv
      |  FROM events GROUP BY 1, 2)""".stripMargin

  // Haldane-Anscombe corrected cells (+0.5 each) — the standard fix that
  // keeps the odds ratio and its Wald interval finite when a cell is 0.
  // .5 terms are exact in binary, so both engines see identical doubles.
  private val orE =
    "((CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5) / " +
      "((CAST(b AS DOUBLE) + 0.5) * (CAST(c AS DOUBLE) + 0.5)))"
  private val lorE = s"round(ln$orE, 9)"
  private val orSeE =
    "round(sqrt(1.0 / (CAST(a AS DOUBLE) + 0.5) + " +
      "1.0 / (CAST(b AS DOUBLE) + 0.5) + " +
      "1.0 / (CAST(c AS DOUBLE) + 0.5) + " +
      "1.0 / (CAST(d AS DOUBLE) + 0.5)), 9)"
  private val rrE =
    "((CAST(a AS DOUBLE) + 0.5) / (CAST(a AS DOUBLE) + " +
      "CAST(b AS DOUBLE) + 1.0) / ((CAST(c AS DOUBLE) + 0.5) / " +
      "(CAST(c AS DOUBLE) + CAST(d AS DOUBLE) + 1.0)))"

  /** q_cramers_v per-cell chi-square contribution, micro-frozen so the
    * cross-cell sum is an exact BIGINT in both engines (cell order is
    * engine-dependent; float addition is not associative). `obs` is the
    * observed-count expression (engines differ in how they spell the
    * null-fill of empty grid cells). */
  private def chiTermE(obs: String): String = {
    val e = "(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / " +
      "CAST(n AS DOUBLE))"
    s"CAST(round((CAST($obs AS DOUBLE) - $e) * " +
      s"(CAST($obs AS DOUBLE) - $e) / $e * 1000000.0, 0) AS BIGINT)"
  }

  // q_bayes_ab fixed integration grid: 2048 midpoints. Posterior is
  // Beta(1+s, 1+n-s) per arm; the log-density shape (normalizer dropped —
  // it cancels after grid normalization) is frozen at 9 dp, weights at
  // picounits, so the grid CDF is an exact BIGINT running sum.
  private val bayesG = 2048
  private val bayesXE = s"((CAST(i AS DOUBLE) - 0.5) / $bayesG.0)"
  private def bayesLwE(sCol: String, nCol: String): String =
    s"round(CAST($sCol AS DOUBLE) * ln(x) + " +
      s"CAST($nCol - $sCol AS DOUBLE) * ln(1.0 - x), 9)"
  private def bayesW12E(lw: String, mx: String): String =
    s"CAST(round(exp($lw - $mx) * 1000000000000.0, 0) AS BIGINT)"

  // q_msprt per-day log mixture-likelihood-ratio (Johari et al.'s mSPRT
  // with a N(0, tau^2) mixture, tau^2 = the pooled variance g): written
  // once, interpolated into both engines, all inputs exact cumulative
  // integers so the single expression tree sees identical doubles.
  private def msprtLlamE(g: String): String = {
    val mc = "(CAST(sc6 AS DOUBLE) / CAST(nc AS DOUBLE) / 1000000.0)"
    val mt = "(CAST(st6 AS DOUBLE) / CAST(nt AS DOUBLE) / 1000000.0)"
    val v = s"($g * (1.0 / CAST(nc AS DOUBLE) + " +
      "1.0 / CAST(nt AS DOUBLE)))"
    s"(0.5 * ln($v / ($v + $g)) + ($mt - $mc) * ($mt - $mc) * $g / " +
      s"(2.0 * $v * ($v + $g)))"
  }

  /** q_bayes_ab's windowed grid pipeline: max log-weights (full frame) →
    * picounit weights → running CDF + totals, all on one sorted 2048-row
    * partition. */
  private def cum(g: org.apache.spark.sql.DataFrame,
      run: org.apache.spark.sql.expressions.WindowSpec,
      full: org.apache.spark.sql.expressions.WindowSpec)
      : org.apache.spark.sql.DataFrame = {
    import g.sparkSession.implicits._
    g.withColumn("mxc", max($"lwc").over(full))
      .withColumn("mxt", max($"lwt").over(full))
      .select($"i", $"nc", $"sc", $"nt", $"st",
        expr(bayesW12E("lwc", "mxc")).as("w12c"),
        expr(bayesW12E("lwt", "mxt")).as("w12t"))
      .withColumn("cumc", sum($"w12c").over(run))
      .withColumn("zc", sum($"w12c").over(full))
      .withColumn("zt", sum($"w12t").over(full))
  }

  val queries: Seq[(String, GQuery)] = Seq(

    // Odds ratio + relative risk of conversion (>= 1 purchase) for the
    // house A/B assignment, with the Wald 95% CI on the odds ratio —
    // the effect-size readout that accompanies q_ab_test's verdict.
    // Cells are exact distinct-user counts (one user-keyed agg, one
    // 1-row reduce); Haldane-Anscombe +0.5 keeps everything finite and
    // exactly representable. ln/exp results are 9-dp frozen before the
    // micro outputs. Scale: one corpus shuffle at any size.
    "q_odds_ratio" -> GQuery(
      (s, d) => {
        import s.implicits._
        userConv(s, d)
          .agg(
            sum(when($"arm" === 1L && $"conv" === 1L, 1L).otherwise(0L))
              .as("a"),
            sum(when($"arm" === 1L && $"conv" === 0L, 1L).otherwise(0L))
              .as("b"),
            sum(when($"arm" === 0L && $"conv" === 1L, 1L).otherwise(0L))
              .as("c"),
            sum(when($"arm" === 0L && $"conv" === 0L, 1L).otherwise(0L))
              .as("d"))
          .select($"a", $"b", $"c", $"d",
            expr(s"CAST(round($orE * 1000000.0, 0) AS BIGINT)")
              .as("or_micro"),
            expr(s"CAST(round($rrE * 1000000.0, 0) AS BIGINT)")
              .as("rr_micro"),
            expr(s"CAST(round(exp($lorE - 1.959964 * $orSeE) * " +
              "1000000.0, 0) AS BIGINT)").as("ci_lo_micro"),
            expr(s"CAST(round(exp($lorE + 1.959964 * $orSeE) * " +
              "1000000.0, 0) AS BIGINT)").as("ci_hi_micro"))
      },
      Some(s"""WITH $duckUserConv,
        |cells AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(SUM(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d
        |  FROM u)
        |SELECT a, b, c, d,
        |  CAST(round($orE * 1000000.0, 0) AS BIGINT) AS or_micro,
        |  CAST(round($rrE * 1000000.0, 0) AS BIGINT) AS rr_micro,
        |  CAST(round(exp($lorE - 1.959964 * $orSeE) * 1000000.0, 0)
        |    AS BIGINT) AS ci_lo_micro,
        |  CAST(round(exp($lorE + 1.959964 * $orSeE) * 1000000.0, 0)
        |    AS BIGINT) AS ci_hi_micro
        |FROM cells""".stripMargin),
      "conversion odds ratio + relative risk with Wald 95% CI " +
        "(Haldane-corrected exact cells, 9-dp frozen ln/exp)"),

    // Cramér's V association strength between order status and order
    // priority — the "is this contingency table structure or noise"
    // readout over a category-bounded grid. The FULL grid (including
    // empty cells, which still contribute their expectation to chi^2)
    // is rebuilt as rows x cols left-join cells; per-cell terms freeze
    // to micro so the grid sum is exact. One grouped agg on orders +
    // three broadcast-sized rollups of it.
    "q_cramers_v" -> GQuery(
      (s, d) => {
        import s.implicits._
        val cells = Tables.load(s, d, "orders")
          .groupBy($"o_orderstatus".as("st"), $"o_orderpriority".as("pr"))
          .agg(count(lit(1)).as("obs"))
        val rows = cells.groupBy($"st").agg(sum($"obs").as("rt"))
        val cols = cells.groupBy($"pr").agg(sum($"obs").as("ct"))
        val tot = cells.agg(sum($"obs").as("n"),
          countDistinct($"st").as("r"), countDistinct($"pr").as("c"))
        val grid = rows.crossJoin(cols)
          .join(cells, Seq("st", "pr"), "left")
          .na.fill(0L, Seq("obs"))
          .crossJoin(broadcast(tot))
          .select($"n", $"r", $"c", expr(chiTermE("obs")).as("t6"))
        grid.groupBy($"n", $"r", $"c")
          .agg(sum($"t6").as("chi2_micro"))
          .select($"n", $"r", $"c", $"chi2_micro",
            expr("CAST(round(sqrt(CAST(chi2_micro AS DOUBLE) / " +
              "1000000.0 / (CAST(n AS DOUBLE) * " +
              "CAST(least(r, c) - 1 AS DOUBLE))) * 1000000.0, 0) " +
              "AS BIGINT)").as("v_micro"))
      },
      Some(s"""WITH cells AS (
        |  SELECT o_orderstatus AS st, o_orderpriority AS pr,
        |    CAST(COUNT(*) AS BIGINT) AS obs
        |  FROM orders GROUP BY 1, 2),
        |rows_ AS (SELECT st, CAST(SUM(obs) AS BIGINT) AS rt
        |  FROM cells GROUP BY 1),
        |cols_ AS (SELECT pr, CAST(SUM(obs) AS BIGINT) AS ct
        |  FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT st) AS BIGINT) AS r,
        |  CAST(COUNT(DISTINCT pr) AS BIGINT) AS c FROM cells),
        |grid AS (
        |  SELECT n, r, c, ${chiTermE("COALESCE(cells.obs, 0)")} AS t6
        |  FROM rows_ CROSS JOIN cols_
        |  LEFT JOIN cells USING (st, pr) CROSS JOIN tot)
        |SELECT n, r, c, CAST(SUM(t6) AS BIGINT) AS chi2_micro,
        |  CAST(round(sqrt(CAST(SUM(t6) AS DOUBLE) / 1000000.0 /
        |    (CAST(n AS DOUBLE) * CAST(least(r, c) - 1 AS DOUBLE))) *
        |    1000000.0, 0) AS BIGINT) AS v_micro
        |FROM grid GROUP BY 1, 2, 3""".stripMargin),
      "Cramér's V over the status x priority contingency grid " +
        "(full grid incl. empty cells, micro-frozen chi-square terms)"),

    // Bayesian A/B conversion readout: Beta(1+s, 1+n-s) posteriors per
    // arm, P(treated beats control) by exact fixed-grid integration —
    // 2048 midpoints, 9-dp frozen log-densities, picounit weights, so
    // the grid CDF is an exact integer running sum and the final dot
    // product is deterministic to far below the micro output. The
    // midpoint-rule convention F(x_i) = (cum_i - w_i/2)/Z is stated
    // here and mirrored by the recount spec. Scale: one user-keyed
    // corpus shuffle; everything after is a fixed 2048-row grid.
    "q_bayes_ab" -> GQuery(
      (s, d) => {
        import s.implicits._
        val arms = userConv(s, d).agg(
          sum(when($"arm" === 0L, 1L).otherwise(0L)).as("nc"),
          sum(when($"arm" === 0L, $"conv").otherwise(0L)).as("sc"),
          sum(when($"arm" === 1L, 1L).otherwise(0L)).as("nt"),
          sum(when($"arm" === 1L, $"conv").otherwise(0L)).as("st"))
        val g = s.range(1, bayesG + 1L).select($"id".as("i"))
          .crossJoin(broadcast(arms))
          .select($"i", $"nc", $"sc", $"nt", $"st",
            expr(bayesXE).as("x"))
          .select($"i", $"nc", $"sc", $"nt", $"st",
            expr(bayesLwE("sc", "nc")).as("lwc"),
            expr(bayesLwE("st", "nt")).as("lwt"))
        // One global sort hosts EVERY grid aggregate as a stacked window
        // (max log-weight, running CDF, full-frame totals) — the grid is
        // a single 2048-row partition either way, so folding the scalar
        // aggs into frames removes 6 SinglePartition exchanges that a
        // crossJoin-of-aggs formulation would pay.
        val run = Window.orderBy($"i")
        val full = Window.orderBy($"i")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        cum(g, run, full)
          .select($"nc", $"sc", $"nt", $"st",
            (($"w12t".cast("double")) *
              (lit(2.0) * $"cumc".cast("double") -
                $"w12c".cast("double"))).as("term"),
            $"zc", $"zt")
          .groupBy($"nc", $"sc", $"nt", $"st", $"zc", $"zt")
          .agg(sum($"term").as("num"))
          .select($"nc", $"sc", $"nt", $"st",
            expr("CAST(round(num / (2.0 * CAST(zc AS DOUBLE) * " +
              "CAST(zt AS DOUBLE)) * 1000000.0, 0) AS BIGINT)")
              .as("p_t_beats_c_micro"),
            expr("CAST(round((1.0 + CAST(sc AS DOUBLE)) / " +
              "(2.0 + CAST(nc AS DOUBLE)) * 1000000.0, 0) AS BIGINT)")
              .as("mean_c_micro"),
            expr("CAST(round((1.0 + CAST(st AS DOUBLE)) / " +
              "(2.0 + CAST(nt AS DOUBLE)) * 1000000.0, 0) AS BIGINT)")
              .as("mean_t_micro"))
      },
      Some(s"""WITH $duckUserConv,
        |a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nc,
        |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
        |      AS sc,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nt,
        |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
        |      AS st
        |  FROM u),
        |g AS (
        |  SELECT i, nc, sc, nt, st,
        |    ${bayesLwE("sc", "nc")} AS lwc,
        |    ${bayesLwE("st", "nt")} AS lwt
        |  FROM (SELECT unnest(generate_series(1, $bayesG)) AS i) s,
        |    LATERAL (SELECT $bayesXE AS x) xx, a),
        |mx AS (SELECT MAX(lwc) AS mxc, MAX(lwt) AS mxt FROM g),
        |w AS (
        |  SELECT i, nc, sc, nt, st,
        |    ${bayesW12E("lwc", "mxc")} AS w12c,
        |    ${bayesW12E("lwt", "mxt")} AS w12t
        |  FROM g, mx),
        |c AS (
        |  SELECT i, nc, sc, nt, st, w12c, w12t,
        |    CAST(SUM(w12c) OVER (ORDER BY i) AS BIGINT) AS cumc
        |  FROM w),
        |z AS (SELECT CAST(SUM(w12c) AS BIGINT) AS zc,
        |  CAST(SUM(w12t) AS BIGINT) AS zt FROM w),
        |nm AS (
        |  SELECT nc, sc, nt, st,
        |    SUM(CAST(w12t AS DOUBLE) * (2.0 * CAST(cumc AS DOUBLE) -
        |      CAST(w12c AS DOUBLE))) AS num
        |  FROM c GROUP BY 1, 2, 3, 4)
        |SELECT nc, sc, nt, st,
        |  CAST(round(num / (2.0 * CAST(zc AS DOUBLE) *
        |    CAST(zt AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
        |    AS p_t_beats_c_micro,
        |  CAST(round((1.0 + CAST(sc AS DOUBLE)) /
        |    (2.0 + CAST(nc AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
        |    AS mean_c_micro,
        |  CAST(round((1.0 + CAST(st AS DOUBLE)) /
        |    (2.0 + CAST(nt AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
        |    AS mean_t_micro
        |FROM nm, z""".stripMargin),
      "Bayesian A/B: P(treated beats control) by exact 2048-point " +
        "grid integration of Beta posteriors (picounit weights)"),

    // Always-valid sequential monitor: the mixture SPRT (normal mixture,
    // tau^2 = pooled variance) over the cumulative day-by-day A/B value
    // readout — the statistic a platform checks DAILY without inflating
    // false positives the way repeated t-tests do. Cumulative per-arm
    // (n, sum) are exact integer running sums over the bounded day
    // table (arm-partitioned windows); the pooled variance is one
    // corpus-exact moment battery frozen at 9 dp; log Lambda is emitted
    // (micro) so no overflow at any effect size. significant compares
    // against ln(20) = the alpha = 0.05 always-valid fence.
    "q_msprt" -> GQuery(
      (s, d) => {
        import s.implicits._
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val ev = Tables.load(s, d, "events")
          .filter($"value".isNotNull)
          .select(to_date($"ts").as("day"),
            pmod($"user_id", lit(2L)).as("arm"),
            expr("CAST(round(value * 1000000.0, 0) AS BIGINT)")
              .as("v6"))
        val mom = ev.agg(count(lit(1)).as("n"),
          sum($"v6".cast(d38)).as("s1"),
          sum(($"v6".cast(d38)) * ($"v6".cast(d38))).as("s2"))
          .select(expr("round((CAST(s2 AS DOUBLE) / 1e12 - " +
            "CAST(s1 AS DOUBLE) / 1e6 * CAST(s1 AS DOUBLE) / 1e6 / " +
            "CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE), 9)").as("g"))
        val daily = ev.groupBy($"day", $"arm")
          .agg(count(lit(1)).as("dn"), sum($"v6").as("ds"))
        val wArm = Window.partitionBy($"arm").orderBy($"day")
        val cum = daily
          .withColumn("cn", sum($"dn").over(wArm))
          .withColumn("cs", sum($"ds").over(wArm))
        val c0 = cum.filter($"arm" === 0L)
          .select($"day", $"cn".as("nc"), $"cs".as("sc6"))
        val c1 = cum.filter($"arm" === 1L)
          .select($"day", $"cn".as("nt"), $"cs".as("st6"))
        c0.join(c1, "day")
          .crossJoin(broadcast(mom))
          .select($"day", $"nc", $"nt",
            expr(s"CAST(round(${msprtLlamE("g")} * 1000000.0, 0) " +
              "AS BIGINT)").as("log_lambda_micro"))
          .withColumn("significant", $"log_lambda_micro" > 2995732L)
          .orderBy($"day")
      },
      Some(s"""WITH ev AS (
        |  SELECT CAST(ts AS DATE) AS day, user_id % 2 AS arm,
        |    CAST(round(value * 1000000.0, 0) AS BIGINT) AS v6
        |  FROM events WHERE value IS NOT NULL),
        |mom AS (
        |  SELECT round((CAST(SUM(CAST(v6 AS DECIMAL(38,0)) *
        |    CAST(v6 AS DECIMAL(38,0))) AS DOUBLE) / 1e12 -
        |    CAST(SUM(v6) AS DOUBLE) / 1e6 * CAST(SUM(v6) AS DOUBLE) /
        |    1e6 / CAST(COUNT(*) AS DOUBLE)) /
        |    CAST(COUNT(*) - 1 AS DOUBLE), 9) AS g
        |  FROM ev),
        |daily AS (
        |  SELECT day, arm, CAST(COUNT(*) AS BIGINT) AS dn,
        |    CAST(SUM(v6) AS BIGINT) AS ds
        |  FROM ev GROUP BY 1, 2),
        |cum AS (
        |  SELECT day, arm,
        |    CAST(SUM(dn) OVER (PARTITION BY arm ORDER BY day)
        |      AS BIGINT) AS cn,
        |    CAST(SUM(ds) OVER (PARTITION BY arm ORDER BY day)
        |      AS BIGINT) AS cs
        |  FROM daily)
        |SELECT c0.day, c0.cn AS nc, c1.cn AS nt,
        |  CAST(round(${msprtLlamE("g")} * 1000000.0, 0) AS BIGINT)
        |    AS log_lambda_micro,
        |  CAST(round(${msprtLlamE("g")} * 1000000.0, 0) AS BIGINT)
        |    > 2995732 AS significant
        |FROM (SELECT day, cn, cs AS sc6 FROM cum WHERE arm = 0) c0
        |JOIN (SELECT day, cn, cs AS st6 FROM cum WHERE arm = 1) c1
        |  USING (day), mom,
        |  LATERAL (SELECT c0.cn AS nc, c1.cn AS nt) nn
        |ORDER BY c0.day""".stripMargin),
      "mixture-SPRT always-valid A/B monitor: per-day log Lambda from " +
        "exact cumulative arm sums, ln(20) fence"),
  )
}
