package graft

import org.apache.spark.sql.SparkSession

/** Scale-killer scan over EVERY registered query's physical plan — the
  * audit the round reviews run by hand, institutionalized (the sweep.sh
  * treatment for plan shapes instead of timings):
  *
  * {{{ sbt "runMain graft.PlanAudit /root/testdata/sf0.001" }}}
  *
  * Flags, per query:
  *  - `cartesian`   — CartesianProduct anywhere (never acceptable);
  *  - `udf`         — ScalaUDF / BatchEvalPython (never acceptable);
  *  - `globalwin`   — a WindowExec whose spec has no PARTITION BY (all
  *    rows through one task). Acceptable ONLY over domain-bounded
  *    tables (bucket/band/day/k-row); every acceptance is named in the
  *    allowlist below WITH its bound, so a new unbounded global window
  *    can't slip in silently;
  *  - `singlepart`  — count of `Exchange SinglePartition` nodes beyond
  *    the first (one 1-row scalar reduction is the lazy-anchor pattern;
  *    more deserve a look).
  *
  * Exit code 1 if any query trips a flag outside the allowlist — wire
  * it into a round's gate exactly like the scaling sweep. Plans build at
  * sf0.001 (shape, not volume, is under audit; plan shape is
  * SF-independent for every registered query). */
object PlanAudit {

  /** Global-window acceptances: query -> the domain bound that keeps the
    * single partition small. EXACTLY the queries whose plans carry a
    * global ordered window today (the audit fails on any new one), each
    * with the bound sourced from its Scaladoc — no blanket passes. */
  val GlobalWindowBounds: Map[String, String] = Map(
    "q_dim_build" -> ("surrogate row_number over the DISTINCT dimension " +
      "values — cardinality-bounded; scalable twin buildDimScalable"),
    "q_fact_join" -> ("same dimension surrogate build as q_dim_build " +
      "(cardinality-bounded) feeding the broadcast fact join"),
    "q_window_rownum" -> ("the operator demo itself; the SCALE path is " +
      "the zipRank twin asserted row-identical in the same query"),
    "q_rolling_distinct" -> "7-day rolling over the bounded day table",
    "q_rolling_distinct_exact" -> "same bounded day table",
    "q_pareto_front" -> "bounded price x recency bucket grid",
    "q_lorenz" -> "bounded spender-band table",
    "q_hill_tail" -> "top-k tail only",
    "q_gini" -> "bounded source table",
    "q_auc" -> "bounded score-bucket CDF table (two-phase decomposition)",
    "q_ks_test" -> "bounded value-bucket CDF table",
    "q_woe_iv" -> "bounded band table",
    "q_pr_curve" -> "bounded threshold table",
    "q_changepoint" -> "bounded day table",
    "q_page_hinkley" -> ("running sum + running min over the bounded " +
      "day table — the q_cusum dissolution with a running-mean " +
      "baseline"),
    "q_zipf_slope" -> "vocabulary-bounded rank table",
    "q_domain_mix" -> "one row per source",
    "q_rrf_fusion" -> "bounded fused top-k",
    "q_mannwhitney" -> ("running rank sum over the value-grain table — " +
      "l_quantity lives on a 0.01 grid in [1, 50], <= 4901 rows at any " +
      "corpus size"),
    "q_spearman" -> ("two running rank sums over the value-grain " +
      "tables — quantity and discount grids are <= 4901 and <= 11 rows " +
      "at any corpus size"),
    "q_kruskal_wallis" -> ("running rank sum over the value-grain " +
      "table — l_quantity grid is <= 4901 rows at any corpus size"),
    "q_kaplan_meier" -> ("reverse running sum over the duration-day " +
      "table — bounded by the observation window's day count"),
    "q_wilcoxon" -> ("running midrank sum over the |diff| value-grain " +
      "table — diffs live on the 0.01 quantity grid bounded by " +
      "max-lines-per-order x qty range, not by corpus size"),
    "q_cliff_delta" -> ("running dominance sum over the l_quantity " +
      "value-grain table — <= 4901 rows at any corpus size (the " +
      "q_mannwhitney bound)"),
    "q_logrank" -> ("two reverse running sums over the duration-day " +
      "table — bounded by the observation window's day count (the " +
      "q_kaplan_meier bound)"),
    "q_durbin_watson" -> ("lag window over the daily-residual table — " +
      "bounded by the calendar window's day count"),
    "q_cusum" -> ("two running sums over the bounded day table — the " +
      "q_changepoint bound"),
    "q_stump" -> ("two running sums over the n_chars value grain — " +
      "bounded by the doc-length domain, not corpus size"),
    "q_bayes_ab" -> ("grid-CDF running sum over the FIXED 2048-point " +
      "integration grid — constant size at any corpus size"),
    "q_periodogram" -> ("max/total normalizers over the FIXED 13-row " +
      "candidate-period grid — constant size at any corpus size"),
    "q_nelson_aalen" -> ("reverse at-risk + forward hazard running " +
      "sums over the duration-day table — bounded by the observation " +
      "window's day count (the q_kaplan_meier bound)"),
    "q_croston" -> ("arrival ranks + lag intervals over the demand-" +
      "day table — calendar-bounded (<= observation window days)"),
    "q_gains" -> ("running sums over the activity-score VALUE grain " +
      "— bounded by per-user event counts, not corpus size (the " +
      "q_stump argument)"),
    "q_anderson_darling" -> ("rank window over the bounded day table " +
      "— the q_changepoint bound"),
    "q_bh_fdr" -> ("BH decision chain over the category-bounded " +
      "metric table (one row per event type)"),
    "q_holm" -> ("Holm step-down running-failure max over the same " +
      "category-bounded metric table as q_bh_fdr"),
    "q_shapiro_francia" -> ("Blom-score rank window over the bounded " +
      "day table — the q_changepoint bound"),
    "q_hurst" -> ("day-index rank over the bounded day table feeding " +
      "block-partitioned cumulative windows — the q_changepoint bound"),
    "q_runs_test" -> ("sign-lag window over the bounded day table — " +
      "the q_changepoint bound"),
    "q_sign_trend" -> ("day rank + ln-factorial running sum over the " +
      "calendar-bounded integer spine (N <= day count <= ~2.4k)"),
    "q_cvm" -> ("cumulative arm counts over the centi value grid — " +
      "bounded by the value domain (<= ~49k cells), the q_qte class"),
    "q_rbo" -> ("row_number over the 20-row post-limit top-k — " +
      "constant-size input by construction"),
    "q_mood_median" -> ("grand-median cumulative counts over the " +
      "centi value grid — bounded by the value domain, the q_cvm " +
      "class"))

  /** True when the physical-plan string contains a WindowExec with an
    * ORDER BY but no PARTITION BY — the all-rows-through-one-task shape.
    * String-split heuristic over Spark's plan rendering; pinned by
    * PlanAuditSpec against one live plan of each shape so a format
    * change in a future Spark breaks the test, not the gate. */
  def hasGlobalOrderedWindow(plan: String): Boolean =
    plan.split("\n").exists { l =>
      if (!l.contains("Window [")) false
      else {
        val groups = l.split("\\], \\[")
        groups.length == 2 &&
          (groups(1).contains(" ASC") || groups(1).contains(" DESC"))
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .appName("graft-plan-audit")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var failures = 0
    var flagged = 0
    SparkEntry.all.foreach { case (name, q) =>
      val plan =
        try q.fn(spark, sfDir).queryExecution.executedPlan.toString
        catch {
          case scala.util.control.NonFatal(e) =>
            println(s"$name\tPLAN_ERROR\t${e.getClass.getSimpleName}")
            failures += 1
            ""
        }
      if (plan.nonEmpty) {
        val cartesian = plan.contains("CartesianProduct")
        val udf = plan.contains("ScalaUDF") || plan.contains("BatchEvalPython")
        // WindowExec renders `Window [exprs], [partSpec], [orderSpec]`
        // when fully specified but drops the empty clause: BOTH a global
        // window (`Window [exprs], [orderSpec]`) and a partitioned
        // no-order window (`Window [exprs], [partSpec]` — scale-safe,
        // e.g. count(1) over (partition by fp)) render with one "], ["
        // separator. The discriminator is the trailing spec group: order
        // specs carry ASC/DESC, partition specs never do (empirically
        // checked against q_window_rownum's allowlisted global
        // row_number — q_rfm's former global ntiles, the original
        // evidence, were replaced by zipRank arithmetic — vs
        // q_dup_spans' fp partition counts; PlanAuditSpec pins the
        // discriminator against one plan of each shape so a future
        // plan-string format change fails loudly instead of silently
        // blinding the gate).
        val globalWin = hasGlobalOrderedWindow(plan)
        val singles =
          plan.split("\n").count(_.contains("Exchange SinglePartition"))
        val flags = Seq(
          if (cartesian) Some("cartesian") else None,
          if (udf) Some("udf") else None,
          if (globalWin && !GlobalWindowBounds.contains(name))
            Some("globalwin-UNBOUNDED") else None,
          if (globalWin && GlobalWindowBounds.contains(name))
            Some("globalwin-allowed") else None,
          if (singles > 1) Some(s"singlepart x$singles") else None).flatten
        if (flags.exists(f =>
            f == "cartesian" || f == "udf" || f.contains("UNBOUNDED")))
          failures += 1
        if (flags.nonEmpty) {
          flagged += 1
          println(s"$name\t${flags.mkString(",")}")
        }
      }
    }
    println(s"== audited ${SparkEntry.all.size} plans: " +
      s"$flagged flagged, $failures failing ==")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
