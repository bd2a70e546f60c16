package graft.operators

import graft.{Fns, GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event analytics over `events` (SURVEY.md §2.12 extension
  * tier): ordered funnels and cohort retention — the two query shapes an
  * event warehouse runs constantly and a naive engine gets wrong (a funnel
  * is ORDER-sensitive: stage N+1 must happen strictly AFTER the user's
  * stage-N time, so it cannot be a flat per-type aggregate).
  *
  * Scale shape: every join here is keyed on `user_id`, so the whole
  * pipeline is one hash-partitioning of events by user reused across
  * stages (co-partitioned shuffles; Spark reuses the exchange). Nothing
  * is collected, nothing is per-user looped — at 100 TB the funnel is
  * three partial-aggregated shuffles, not a driver iteration.
  */
object Behavior {

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "events")

  /** Per-user staged first-times: (user_id, t_view, t_click, t_purchase)
    * with each stage strictly after the previous — shared by q_funnel and
    * q_funnel_rate. */
  private def funnelStages(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = ev(s, d).select($"user_id", $"event_type", $"ts")
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t_view"))
    val c = e.filter($"event_type" === "click")
      .join(v, "user_id").filter($"ts" > $"t_view")
      .groupBy($"user_id").agg(min($"ts").as("t_click"))
    val p = e.filter($"event_type" === "purchase")
      .join(c, "user_id").filter($"ts" > $"t_click")
      .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
  }

  private val funnelSqlCtes = """e AS (
    |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events),
    |v AS (SELECT user_id, min(t) AS t_view FROM e
    |      WHERE event_type = 'view' GROUP BY 1),
    |c AS (SELECT e.user_id, min(t) AS t_click FROM e
    |      JOIN v ON e.user_id = v.user_id
    |      WHERE event_type = 'click' AND t > t_view GROUP BY 1),
    |p AS (SELECT e.user_id, min(t) AS t_purchase FROM e
    |      JOIN c ON e.user_id = c.user_id
    |      WHERE event_type = 'purchase' AND t > t_click GROUP BY 1)""".stripMargin

  val queries: Seq[(String, GQuery)] = Seq(

    // Ordered 3-stage funnel view -> click -> purchase: per user, first
    // view time, first click strictly after it, first purchase strictly
    // after that, and the stage count reached. Each stage is a keyed
    // semi-structured join + min-agg (partial aggregation on the map
    // side); stage N's output is tiny (<= one row per user) so the next
    // stage's join is against the shrunken set.
    "q_funnel" -> GQuery(
      (s, d) => {
        import s.implicits._
        funnelStages(s, d)
          .select($"user_id", $"t_view", $"t_click", $"t_purchase",
            (lit(1) +
              when($"t_click".isNotNull, 1).otherwise(0) +
              when($"t_purchase".isNotNull, 1).otherwise(0)).as("stage"))
          .orderBy($"user_id")
      },
      Some(s"""WITH $funnelSqlCtes
        |SELECT v.user_id, t_view, t_click, t_purchase,
        |  1 + CASE WHEN t_click IS NULL THEN 0 ELSE 1 END
        |    + CASE WHEN t_purchase IS NULL THEN 0 ELSE 1 END AS stage
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin),
      "ordered view->click->purchase funnel with strict-after stage times"),

    // Funnel conversion summary: stage populations + step conversion
    // rates. One global aggregate over the (<= one row per user) staged
    // table; rates are single IEEE divisions of exact counts.
    "q_funnel_rate" -> GQuery(
      (s, d) => {
        import s.implicits._
        funnelStages(s, d).agg(
          count($"t_view").as("n_view"),
          count($"t_click").as("n_click"),
          count($"t_purchase").as("n_purchase"))
          .select($"n_view", $"n_click", $"n_purchase",
            ($"n_click".cast("double") / $"n_view").as("view_to_click"),
            ($"n_purchase".cast("double") / $"n_click").as("click_to_purchase"))
      },
      Some(s"""WITH $funnelSqlCtes,
        |f AS (SELECT v.user_id, t_view, t_click, t_purchase
        |      FROM v LEFT JOIN c ON v.user_id = c.user_id
        |             LEFT JOIN p ON v.user_id = p.user_id)
        |SELECT COUNT(t_view) AS n_view, COUNT(t_click) AS n_click,
        |  COUNT(t_purchase) AS n_purchase,
        |  CAST(COUNT(t_click) AS DOUBLE) / COUNT(t_view) AS view_to_click,
        |  CAST(COUNT(t_purchase) AS DOUBLE) / COUNT(t_click)
        |    AS click_to_purchase
        |FROM f""".stripMargin),
      "funnel stage populations + step conversion rates"),

    // Gap-based sessionization WITH SESSION IDS (q_session_window
    // aggregates Spark's session_window; this assigns the per-user
    // session sequence a downstream table can join on): lag to detect a
    // >30 min gap, running sum of gap flags = session ordinal. One
    // user-keyed partition exchange feeds both windows and the final
    // aggregate — no second shuffle.
    "q_sessionize" -> GQuery(
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts")
        ev(s, d).select($"user_id", $"ts")
          .withColumn("prev", lag($"ts", 1).over(w))
          .withColumn("new_sess",
            when($"prev".isNull ||
              unix_timestamp($"ts") - unix_timestamp($"prev") > 1800L, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum($"new_sess").over(
            w.rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)))
          .groupBy($"user_id", $"session_id")
          .agg(count(lit(1)).as("n_events"),
            min($"ts").as("session_start"),
            max($"ts").as("session_end"))
          .withColumn("duration_sec",
            unix_timestamp($"session_end") - unix_timestamp($"session_start"))
          .orderBy($"user_id", $"session_id")
      },
      Some("""WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events),
        |g AS (
        |  SELECT user_id, t,
        |    CASE WHEN prev IS NULL
        |           OR date_diff('second', prev, t) > 1800 THEN 1
        |         ELSE 0 END AS new_sess
        |  FROM (SELECT user_id, t,
        |          lag(t) OVER (PARTITION BY user_id ORDER BY t) AS prev
        |        FROM e)),
        |s AS (
        |  SELECT user_id, t,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(t) AS session_start, MAX(t) AS session_end,
        |  date_diff('second', MIN(t), MAX(t)) AS duration_sec
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      "gap-based sessionization with per-user session ids"),

    // Cohort retention: users grouped by first-activity date, activity
    // counted per (cohort, day-offset) cell. The first-activity table is
    // user-keyed like events itself; the distinct count is the standard
    // two-phase (partial + final) aggregate.
    "q_retention" -> GQuery(
      (s, d) => {
        import s.implicits._
        val days = ev(s, d).select($"user_id", to_date($"ts").as("day"))
        val first = days.groupBy($"user_id").agg(min($"day").as("cohort_day"))
        days.join(first, "user_id")
          .select($"cohort_day",
            datediff($"day", $"cohort_day").cast("bigint").as("day_offset"),
            $"user_id")
          .groupBy($"cohort_day", $"day_offset")
          .agg(countDistinct($"user_id").as("n_active"))
          .orderBy($"cohort_day", $"day_offset")
      },
      Some("""WITH e AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
        |SELECT cohort_day,
        |  CAST(datediff('day', cohort_day, day) AS BIGINT) AS day_offset,
        |  COUNT(DISTINCT e.user_id) AS n_active
        |FROM e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      "cohort retention matrix (first-activity cohort x day offset)"),

    // Sequence-pattern matching over per-user event journeys — the
    // MATCH_RECOGNIZE shape (row-pattern recognition) re-expressed as
    // ordered journey strings + regex: each user's events collapse to a
    // first-letter string in (time, event_id) order, and patterns like
    // "view ... purchase" become regexes evaluated engine-side. One
    // user-keyed shuffle; journey bytes are O(events/user). Ordering is
    // EXACT cross-engine: sort key is floored event-time micros (Spark
    // reads nanos `div 1000`; the oracle floors the same way) + event_id,
    // so sub-microsecond neighbors cannot order differently. Regex counts
    // are non-overlapping left-to-right scans in both Java regex and RE2;
    // 'v[^p]*p' cannot backtrack across a 'p', so semantics agree.
    "q_event_pattern" -> GQuery(
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "events")
          .groupBy($"user_id")
          .agg(array_join(expr(
            "transform(array_sort(collect_list(struct(" +
              "unix_micros(ts) AS t, event_id AS i, " +
              "substring(event_type, 1, 1) AS c))), x -> x.c)"), "")
            .as("journey"))
          .select($"user_id",
            length($"journey").as("n_events"),
            size(expr("regexp_extract_all(journey, 'vc', 0)"))
              .as("n_view_click"),
            size(expr("regexp_extract_all(journey, 'v[^p]*p', 0)"))
              .as("n_view_to_purchase"),
            $"journey".rlike("s.*p").as("converted"))
          .orderBy($"user_id")
      },
      Some("""WITH j AS (
        |  SELECT user_id,
        |    string_agg(substring(event_type, 1, 1), ''
        |      ORDER BY epoch_ns(ts) // 1000, event_id) AS journey
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |  CAST(length(journey) AS INT) AS n_events,
        |  CAST(len(regexp_extract_all(journey, 'vc')) AS INT)
        |    AS n_view_click,
        |  CAST(len(regexp_extract_all(journey, 'v[^p]*p')) AS INT)
        |    AS n_view_to_purchase,
        |  regexp_matches(journey, 's.*p') AS converted
        |FROM j ORDER BY user_id""".stripMargin),
      "row-pattern matching over ordered event journeys (MATCH_RECOGNIZE shape)"),

    // Windowed (attribution-bounded) funnel: same view -> click ->
    // purchase staging, but each stage must land within 1 hour of the
    // previous stage's time — the conversion-window semantics real
    // attribution uses (an unbounded funnel credits a purchase weeks
    // later). Same monotone-shrinking keyed joins; the bound is one extra
    // interval predicate per stage.
    "q_funnel_windowed" -> GQuery(
      (s, d) => {
        import s.implicits._
        val e = ev(s, d).select($"user_id", $"event_type", $"ts")
        val v = e.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"ts").as("t_view"))
        val c = e.filter($"event_type" === "click")
          .join(v, "user_id")
          .filter($"ts" > $"t_view" &&
            $"ts" <= $"t_view" + expr("INTERVAL 1 HOUR"))
          .groupBy($"user_id").agg(min($"ts").as("t_click"))
        val p = e.filter($"event_type" === "purchase")
          .join(c, "user_id")
          .filter($"ts" > $"t_click" &&
            $"ts" <= $"t_click" + expr("INTERVAL 1 HOUR"))
          .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .select($"user_id", $"t_view", $"t_click", $"t_purchase",
            (lit(1) +
              when($"t_click".isNotNull, 1).otherwise(0) +
              when($"t_purchase".isNotNull, 1).otherwise(0)).as("stage"))
          .orderBy($"user_id")
      },
      Some("""WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t
        |  FROM events),
        |v AS (SELECT user_id, min(t) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(t) AS t_click FROM e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE event_type = 'click' AND t > t_view
        |        AND t <= t_view + INTERVAL '1 hour' GROUP BY 1),
        |p AS (SELECT e.user_id, min(t) AS t_purchase FROM e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE event_type = 'purchase' AND t > t_click
        |        AND t <= t_click + INTERVAL '1 hour' GROUP BY 1)
        |SELECT v.user_id, t_view, t_click, t_purchase,
        |  1 + CASE WHEN t_click IS NULL THEN 0 ELSE 1 END
        |    + CASE WHEN t_purchase IS NULL THEN 0 ELSE 1 END AS stage
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin),
      "attribution-windowed funnel (1-hour conversion windows)"),

    // Weekly churn: users active in week W who never return in week W+1
    // — the retention complement product analytics reports weekly. One
    // distinct (user, week) table, a per-user lead window, one grouped
    // rollup; weeks are ISO date_trunc so both engines bucket
    // identically.
    "q_churn_weekly" -> GQuery(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"week")
        val uw = ev(s, d)
          .select($"user_id",
            to_date(date_trunc("week", $"ts")).as("week"))
          .distinct()
        uw.withColumn("next_week", lead($"week", 1).over(w))
          .withColumn("churned",
            $"next_week".isNull || $"next_week" > date_add($"week", 7))
          .groupBy($"week")
          .agg(count(lit(1)).as("n_active"),
            sum(when($"churned", 1L).otherwise(0L)).as("n_churned"))
          .select($"week", $"n_active", $"n_churned",
            round($"n_churned".cast("double") / $"n_active".cast("double"), 6)
              .as("churn_rate"))
          .orderBy($"week")
      },
      Some("""WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
        |  FROM events),
        |n AS (
        |  SELECT user_id, week,
        |    lead(week) OVER (PARTITION BY user_id ORDER BY week)
        |      AS next_week
        |  FROM uw)
        |SELECT week, CAST(COUNT(*) AS BIGINT) AS n_active,
        |  CAST(SUM(CASE WHEN next_week IS NULL
        |    OR next_week > week + INTERVAL 7 DAY THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_churned,
        |  round(CAST(SUM(CASE WHEN next_week IS NULL
        |    OR next_week > week + INTERVAL 7 DAY THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS churn_rate
        |FROM n GROUP BY week ORDER BY week""".stripMargin),
      "weekly churn: active users who never return next week"),

    // Event-type transition matrix (first-order Markov view of user
    // journeys): adjacent event pairs per user in exact time order,
    // rolled into counts and row-normalized probabilities — what Sankey
    // flows and next-event models consume. One user-keyed window for
    // the lag, one grouped rollup; same floored-micros + event_id total
    // order as q_event_pattern so both engines see identical
    // adjacency.
    "q_transition_matrix" -> GQuery(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy(unix_micros($"ts"), $"event_id")
        val pairs = ev(s, d)
          .select($"user_id", $"event_id", $"ts", $"event_type")
          .withColumn("next_type", lead($"event_type", 1).over(w))
          .filter($"next_type".isNotNull)
          .groupBy($"event_type".as("from_type"),
            $"next_type".as("to_type"))
          .agg(count(lit(1)).as("n"))
        val totals = pairs.groupBy($"from_type")
          .agg(sum($"n").as("row_total"))
        pairs.join(broadcast(totals), "from_type")
          .select($"from_type", $"to_type", $"n",
            round($"n".cast("double") / $"row_total".cast("double"), 6)
              .as("p"))
          .orderBy($"from_type", $"to_type")
      },
      Some("""WITH s AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts) // 1000, event_id) AS next_type
        |  FROM events),
        |p AS (
        |  SELECT event_type AS from_type, next_type AS to_type,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, SUM(n) AS row_total FROM p GROUP BY 1)
        |SELECT p.from_type, p.to_type, p.n,
        |  round(CAST(p.n AS DOUBLE) / CAST(t.row_total AS DOUBLE), 6) AS p
        |FROM p JOIN t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin),
      "first-order event-type transition matrix (Markov/Sankey view)"),

    // Cohort lifetime value: signup-month cohorts x months-since-signup,
    // with per-cohort CUMULATIVE revenue per user — the curve growth
    // teams read retention against. Revenue joins from orders by
    // customer id (events carry no money), cohorts from each customer's
    // first order month; the cumulative sum is one cohort-keyed window
    // over the (cohort, offset) matrix in exact cents.
    "q_cohort_ltv" -> GQuery(
      (s, d) => {
        import s.implicits._
        val o = Tables.load(s, d, "orders")
          .select($"o_custkey",
            to_date(date_trunc("month", $"o_orderdate")).as("month"),
            round($"o_totalprice" * 100, 0).cast("bigint").as("cents"))
        val cohort = o.groupBy($"o_custkey")
          .agg(min($"month").as("cohort_month"))
        val w = Window.partitionBy($"cohort_month").orderBy($"month_offset")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.join(cohort, "o_custkey")
          .withColumn("month_offset",
            (months_between($"month", $"cohort_month")).cast("bigint"))
          .groupBy($"cohort_month", $"month_offset")
          .agg(sum($"cents").as("cents"),
            countDistinct($"o_custkey").as("n_active"))
          .withColumn("cum_cents", sum($"cents").over(w))
          .select($"cohort_month", $"month_offset", $"n_active",
            round($"cum_cents".cast("double") / 100.0, 2).as("cum_revenue"))
          .orderBy($"cohort_month", $"month_offset")
      },
      Some("""WITH o AS (
        |  SELECT o_custkey,
        |    CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP))
        |      AS DATE) AS month,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |c AS (SELECT o_custkey, MIN(month) AS cohort_month FROM o
        |      GROUP BY 1),
        |g AS (
        |  SELECT c.cohort_month,
        |    CAST(datediff('month', c.cohort_month, o.month) AS BIGINT)
        |      AS month_offset,
        |    CAST(SUM(o.cents) AS BIGINT) AS cents,
        |    CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active
        |  FROM o JOIN c USING (o_custkey) GROUP BY 1, 2)
        |SELECT cohort_month, month_offset, n_active,
        |  round(CAST(SUM(cents) OVER (PARTITION BY cohort_month
        |    ORDER BY month_offset ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0,
        |    2) AS cum_revenue
        |FROM g ORDER BY cohort_month, month_offset""".stripMargin),
      "cohort LTV curve: cumulative revenue by cohort month x offset"),

    // Last-touch attribution: each purchase's value is credited to the
    // user's most recent PRECEDING non-purchase event type (the "touch"
    // channel); purchases with no prior touch fall into '(none)'. One
    // user-partitioned window (the same user_id hash partitioning every
    // Behavior query reuses) carries the last non-null touch forward —
    // last(ignoreNulls) over UNBOUNDED PRECEDING..1 PRECEDING — then a
    // tiny channel rollup. Ordering pins the cross-engine recipe:
    // micros + event_id tie-break; revenue sums in DECIMAL(18,6) (the
    // events.value exact type) so partial-agg order can't drift.
    "q_attribution" -> GQuery(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy(unix_micros($"ts"), $"event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        ev(s, d)
          .select($"user_id", $"event_id", $"ts", $"event_type", $"value")
          .withColumn("touch",
            when($"event_type" =!= "purchase", $"event_type"))
          .withColumn("attr", last($"touch", ignoreNulls = true).over(w))
          .filter($"event_type" === "purchase")
          .groupBy(coalesce($"attr", lit("(none)")).as("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            round(Fns.dsum6($"value"), 6).as("revenue"))
          .orderBy($"channel")
      },
      Some("""WITH e AS (
        |  SELECT user_id, event_id, event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |        ORDER BY epoch_ns(ts) // 1000, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr
        |  FROM events)
        |SELECT COALESCE(attr, '(none)') AS channel,
        |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
        |    AS revenue
        |FROM e WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY channel""".stripMargin),
      "last-touch channel attribution of purchase revenue"),

    // Position-based (U-shaped 40/20/40) multi-touch attribution: each
    // purchase closes a "journey" — the user's touches (non-purchase
    // events) since their previous purchase. Within a journey the first
    // touch earns 40% of the purchase value, the last 40%, and the
    // middles split the remaining 20% (1 touch -> 100%, 2 -> 50/50);
    // purchases with an empty journey fall to '(none)'. The journey id
    // is itself a window (count of PRECEDING purchases), so the whole
    // operator is two passes over one user_id-partitioned window — no
    // self-join, no per-purchase scan; at 100 TB it is exactly the
    // q_attribution shuffle with one more window function on top.
    // Cross-engine exactness: per-touch credit = round(value * weight,
    // 9) summed as DECIMAL(18,9) (the proven rounded-then-decimal-sum
    // recipe); the weight CASE is identical IEEE arithmetic on both
    // engines.
    "q_attribution_multi" -> GQuery(
      (s, d) => {
        import s.implicits._
        val wPrev = Window.partitionBy($"user_id")
          .orderBy(unix_micros($"ts"), $"event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val e = ev(s, d)
          .select($"user_id", $"event_id", $"ts", $"event_type", $"value")
          .withColumn("jid",
            count(when($"event_type" === "purchase", 1)).over(wPrev))
        val touches = e.filter($"event_type" =!= "purchase")
          .withColumn("pos", row_number().over(
            Window.partitionBy($"user_id", $"jid")
              .orderBy(unix_micros($"ts"), $"event_id")))
          .withColumn("n_touch", count(lit(1)).over(
            Window.partitionBy($"user_id", $"jid")))
          .select($"user_id", $"jid", $"event_type", $"pos", $"n_touch")
        val purchases = e.filter($"event_type" === "purchase")
          .select($"user_id", $"jid", $"value")
        val credited = touches
          .join(purchases, Seq("user_id", "jid"))
          .withColumn("w",
            when($"n_touch" === 1, lit(1.0))
              .when($"n_touch" === 2, lit(0.5))
              .when($"pos" === 1 || $"pos" === $"n_touch", lit(0.4))
              .otherwise(lit(0.2) / ($"n_touch" - 2).cast("double")))
          .select($"event_type".as("channel"),
            round($"value" * $"w", 9).cast("decimal(18,9)").as("credit"))
        val untouched = purchases
          .join(touches.select($"user_id", $"jid").distinct(),
            Seq("user_id", "jid"), "left_anti")
          .select(lit("(none)").as("channel"),
            round($"value", 9).cast("decimal(18,9)").as("credit"))
        credited.union(untouched)
          .groupBy($"channel")
          .agg(round(sum($"credit").cast("double"), 6).as("revenue"))
          .orderBy($"channel")
      },
      Some("""WITH e AS (
        |  SELECT user_id, event_id, event_type, value,
        |    epoch_ns(ts) // 1000 AS us,
        |    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
        |      OVER (PARTITION BY user_id
        |        ORDER BY epoch_ns(ts) // 1000, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS jid
        |  FROM events),
        |t AS (
        |  SELECT user_id, jid, event_type, value,
        |    row_number() OVER (PARTITION BY user_id, jid
        |      ORDER BY us, event_id) AS pos,
        |    COUNT(*) OVER (PARTITION BY user_id, jid) AS n_touch
        |  FROM e WHERE event_type <> 'purchase'),
        |p AS (SELECT user_id, jid, value FROM e
        |      WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT t.event_type AS channel,
        |    CAST(round(p.value * (CASE
        |      WHEN t.n_touch = 1 THEN 1.0
        |      WHEN t.n_touch = 2 THEN 0.5
        |      WHEN t.pos = 1 OR t.pos = t.n_touch THEN 0.4
        |      ELSE 0.2 / CAST(t.n_touch - 2 AS DOUBLE) END), 9)
        |      AS DECIMAL(18,9)) AS credit
        |  FROM t JOIN p USING (user_id, jid)
        |  UNION ALL
        |  SELECT '(none)' AS channel,
        |    CAST(round(p.value, 9) AS DECIMAL(18,9)) AS credit
        |  FROM p LEFT JOIN (SELECT DISTINCT user_id, jid FROM t) x
        |    USING (user_id, jid)
        |  WHERE x.user_id IS NULL)
        |SELECT channel,
        |  round(CAST(SUM(credit) AS DOUBLE), 6) AS revenue
        |FROM c GROUP BY 1 ORDER BY channel""".stripMargin),
      "position-based 40/20/40 multi-touch purchase attribution"),

    // Sequential-pattern mining lite: the corpus's most common 3-step
    // event-type journeys (PrefixSpan's length-3 patterns restricted to
    // CONTIGUOUS steps — the high-signal variant dashboards actually
    // show). Two leads over the same user-keyed window the other
    // journey queries reuse, then one grouped count and a total-ordered
    // top-20. Same floored-micros + event_id total order as
    // q_transition_matrix, so both engines see identical adjacency.
    "q_event_trigrams" -> GQuery(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy(unix_micros($"ts"), $"event_id")
        ev(s, d)
          .select($"user_id", $"event_id", $"ts", $"event_type")
          .withColumn("t2", lead($"event_type", 1).over(w))
          .withColumn("t3", lead($"event_type", 2).over(w))
          .filter($"t3".isNotNull)
          .groupBy($"event_type".as("s1"), $"t2".as("s2"), $"t3".as("s3"))
          .agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"s1", $"s2", $"s3")
          .limit(20)
      },
      Some("""WITH s AS (
        |  SELECT event_type AS s1,
        |    lead(event_type, 1) OVER w AS s2,
        |    lead(event_type, 2) OVER w AS s3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY epoch_ns(ts) // 1000, event_id))
        |SELECT s1, s2, s3, CAST(COUNT(*) AS BIGINT) AS n
        |FROM s WHERE s3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, s1, s2, s3 LIMIT 20""".stripMargin),
      "top contiguous 3-step event-type journey patterns"),

    // Data-driven (Markov removal-effect) attribution — the principled
    // alternative to q_attribution's positional rules: model user
    // journeys as a Markov chain over channels (start -> touches ->
    // purchase | null, truncated at first conversion), then credit each
    // channel by how much total conversion DROPS when it is removed
    // (Anderl et al. 2014). The chain solve is a 64-step fixed-point
    // over the 4 transient channel states, run ENTIRELY in integer
    // nano-probability space — p9 = n*1e9 // total, products floored
    // back to nanos — so both engines produce bit-identical fixed
    // points (no float enters until the final micro outputs, computed
    // from identical integers). Distributed work: one user-keyed
    // journey window + a (from,to) count rollup; the <=30-cell matrix
    // then collects to the driver (metadata-scale, the kmeans-centroid
    // pattern) where the 5-scenario iteration is plain BigInt
    // arithmetic. Channel set fixed to the four non-converting event
    // types (stated contract — a dynamic state set would key the
    // pivot differently).
    "q_markov_attribution" -> GQuery(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy(unix_micros($"ts"), $"event_id")
        val seq = ev(s, d)
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("rn", row_number().over(w))
        val firstP = seq.filter($"event_type" === "purchase")
          .groupBy($"user_id").agg(min($"rn").as("prn"))
        val kept = seq.join(firstP, Seq("user_id"), "left")
          .filter($"prn".isNull || $"rn" <= $"prn")
        val w2 = Window.partitionBy($"user_id").orderBy($"rn")
        val pairs = kept
          .withColumn("nxt", lead($"event_type", 1).over(w2))
          .select($"event_type".as("from_t"),
            coalesce($"nxt", when($"event_type" === "purchase",
              lit(null)).otherwise(lit("null"))).as("to_t"))
          .filter($"to_t".isNotNull)
        val starts = kept.filter($"rn" === 1)
          .select(lit("start").as("from_t"), $"event_type".as("to_t"))
        val cntRows = pairs.unionByName(starts)
          .groupBy($"from_t", $"to_t").agg(count(lit(1)).as("n"))
          .collect().map(r =>
            (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

        // driver-side exact-integer chain solve (BigInt mirrors the
        // oracle's HUGEINT floor arithmetic step for step)
        val B = BigInt(1000000000L)
        val tot = mkFroms.map(f =>
          f -> mkTos.map(t => cntRows.getOrElse((f, t), 0L)).sum).toMap
        def p9(f: String, t: String): BigInt =
          if (tot(f) == 0L) BigInt(0)
          else BigInt(cntRows.getOrElse((f, t), 0L)) * B / BigInt(tot(f))
        def solve(removed: Option[String]): BigInt = {
          def clamp(c: String, v: BigInt) =
            if (removed.contains(c)) BigInt(0) else v
          var v = mkChans.map(c =>
            c -> clamp(c, p9(c, "purchase"))).toMap
          for (_ <- 1 to 64) v = mkChans.map { c =>
            c -> clamp(c, p9(c, "purchase") +
              mkChans.map(t => p9(c, t) * v(t) / B).sum)
          }.toMap
          p9("start", "purchase") +
            mkChans.map(t => p9("start", t) * v(t) / B).sum
        }
        val v0 = solve(None)
        // degenerate contracts (one rule, both engines): zero base
        // conversion probability -> empty result (the oracle's re CTE
        // carries WHERE v0 > 0); all-zero removal effects -> share 0
        // (the oracle CASEs sre = 0) instead of Scala's NaN-to-0 vs
        // DuckDB's CAST(round(nan)) error
        val re9 =
          if (v0 == 0) Seq.empty[(String, BigInt)]
          else mkChans.map(c => c -> (B - solve(Some(c)) * B / v0))
        val sre = re9.map(_._2).sum
        val out = re9.map { case (c, r) =>
          (c, math.round(r.toDouble / 1000.0),
            if (sre == 0) 0L
            else math.round(r.toDouble / sre.toDouble * 1000000.0),
            math.round(v0.toDouble / 1000.0))
        }
        s.createDataFrame(out).toDF(
          "channel", "re_micro", "share_micro", "p_base_micro")
          .orderBy($"channel")
      },
      Some(mkOracle),
      "Markov removal-effect attribution over first-conversion " +
        "journeys (bit-exact integer nano-probability fixed point, " +
        "metadata-scale matrix collect)"),
  )

  // ---- q_markov_attribution SQL generation -------------------------------

  /** Channel states (alphabetical — the non-converting event types). */
  private lazy val mkChans = Seq("click", "error", "signup", "view")
  private lazy val mkFroms = "start" +: mkChans
  private lazy val mkTos = mkChans ++ Seq("purchase", "null")

  /** One pivoted-matrix column name per (from, to) cell. */
  private def mkCol(f: String, t: String) = s"p9_${f}_$t"

  /** The full DuckDB oracle: journey counts, integer nano-probability
    * pivot, a 64-step recursive fixed point per removal scenario, and
    * the removal-effect readout — generated from the state lists so the
    * Spark driver loop and this SQL share one structure. */
  private def mkOracle: String = {
    val pivotCols = (for (f <- mkFroms; t <- mkTos if t != "null")
      yield s"""    CAST(COALESCE(MAX(CASE WHEN from_t = '$f' AND
         | to_t = '$t' THEN CAST(n AS HUGEINT) * 1000000000 //
         | CAST(tt AS HUGEINT) END), 0) AS BIGINT) AS ${mkCol(f, t)}"""
        .stripMargin.replace("\n", "")).mkString(",\n")
    val baseV = mkChans.map(c =>
      s"""    CASE WHEN scen = '$c' THEN CAST(0 AS BIGINT)
         | ELSE ${mkCol(c, "purchase")} END AS v_$c"""
        .stripMargin.replace("\n", "")).mkString(",\n")
    def stepSum(f: String) = mkChans.map(t =>
      s"CAST(CAST(${mkCol(f, t)} AS HUGEINT) * v_$t // 1000000000 " +
        "AS BIGINT)").mkString(" + ")
    val stepV = mkChans.map(c =>
      s"""    CASE WHEN scen = '$c' THEN CAST(0 AS BIGINT)
         | ELSE ${mkCol(c, "purchase")} + ${stepSum(c)} END AS v_$c"""
        .stripMargin.replace("\n", "")).mkString(",\n")
    val scenVals = ("none" +: mkChans).map(c => s"('$c')").mkString(", ")
    s"""WITH RECURSIVE seq AS (
       |  SELECT user_id, event_type, row_number() OVER (
       |    PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000,
       |    event_id) AS rn
       |  FROM events),
       |fp AS (SELECT user_id, MIN(rn) AS prn FROM seq
       |  WHERE event_type = 'purchase' GROUP BY 1),
       |kept AS (
       |  SELECT s.user_id, s.event_type, s.rn
       |  FROM seq s LEFT JOIN fp USING (user_id)
       |  WHERE prn IS NULL OR rn <= prn),
       |prs AS (
       |  SELECT event_type AS from_t,
       |    COALESCE(lead(event_type) OVER (PARTITION BY user_id
       |      ORDER BY rn),
       |      CASE WHEN event_type = 'purchase' THEN NULL
       |        ELSE 'null' END) AS to_t
       |  FROM kept),
       |allp AS (
       |  SELECT from_t, to_t FROM prs WHERE to_t IS NOT NULL
       |  UNION ALL
       |  SELECT 'start', event_type FROM kept WHERE rn = 1),
       |cnt AS (SELECT from_t, to_t, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM allp GROUP BY 1, 2),
       |tt AS (SELECT from_t, CAST(SUM(n) AS BIGINT) AS tt
       |  FROM cnt GROUP BY 1),
       |mrow AS (
       |  SELECT
       |$pivotCols
       |  FROM cnt JOIN tt USING (from_t)),
       |it AS (
       |  SELECT scen, 0 AS k,
       |$baseV
       |  FROM (VALUES $scenVals) sc(scen), mrow
       |  UNION ALL
       |  SELECT scen, k + 1,
       |$stepV
       |  FROM it, mrow WHERE k < 64),
       |fin AS (
       |  SELECT scen, ${mkCol("start", "purchase")} +
       |    ${stepSum("start")} AS vs
       |  FROM it, mrow WHERE k = 64),
       |b AS (SELECT vs AS v0 FROM fin WHERE scen = 'none'),
       |re AS (
       |  SELECT scen AS channel,
       |    CAST(1000000000 - CAST(vs AS HUGEINT) * 1000000000 //
       |      CAST(v0 AS HUGEINT) AS BIGINT) AS re9, v0
       |  FROM fin, b WHERE scen <> 'none' AND v0 > 0),
       |t2 AS (SELECT CAST(SUM(re9) AS BIGINT) AS sre FROM re)
       |SELECT channel,
       |  CAST(round(re9 / 1000.0, 0) AS BIGINT) AS re_micro,
       |  CASE WHEN sre = 0 THEN CAST(0 AS BIGINT)
       |    ELSE CAST(round(CAST(re9 AS DOUBLE) / CAST(sre AS DOUBLE) *
       |      1000000.0, 0) AS BIGINT) END AS share_micro,
       |  CAST(round(v0 / 1000.0, 0) AS BIGINT) AS p_base_micro
       |FROM re, t2 ORDER BY channel""".stripMargin
  }
}
