package graft.operators

import graft.{Fns, GQuery, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Event-time window aggregations over `events` (SURVEY.md §2.10/§2.11 X6).
  *
  * The reference is strictly batch (no windows at all); these are the
  * extension tier. Written with the exact same `window()`/`session_window()`
  * expressions Structured Streaming uses, so the identical code runs under
  * `readStream` with a watermark (see graft.streaming.EventStream).
  *
  * Scale notes: tumbling/sliding windows are a single hash-agg keyed by
  * (window, keys) — partial agg collapses each input partition to one row
  * per window before the shuffle. Session windows shuffle by user_id and
  * merge per key — at 100 TB the skew lever is AQE skew-split plus a cap on
  * events per user per day.
  */
object TimeWindows {
  import Fns._

  private def events(s: SparkSession, d: String) = Tables.load(s, d, "events")

  /** Hand-banded form of `q_range_join` — what RangeJoinRewrite produces
    * automatically from the naive inequality join. Kept as the parity
    * reference for RangeJoinRewriteSpec. */
  def bandedFollowers(s: SparkSession, d: String) = {
    import s.implicits._
    val e = events(s, d).select($"event_id", $"user_id", $"ts")
    val a = e
      .withColumn("bucket", explode(array(
        date_trunc("hour", $"ts"),
        date_trunc("hour", $"ts") + expr("INTERVAL 1 HOUR"))))
      .select($"event_id", $"user_id", $"ts".as("ta"), $"bucket")
    val b = e.select($"user_id",
      date_trunc("hour", $"ts").as("bucket"), $"ts".as("tb"))
    a.join(b, Seq("user_id", "bucket"))
      .filter($"tb" > $"ta" && $"tb" <= $"ta" + expr("INTERVAL 1 HOUR"))
      .groupBy($"event_id")
      .agg(count(lit(1)).as("n_followers"))
      .orderBy($"event_id")
  }

  val queries: Seq[(String, GQuery)] = Seq(

    // Banded range join (SURVEY.md §2.3 extension): events followed by
    // another event of the same user within 1 hour. Written as the NAIVE
    // inequality join — graft.plans.RangeJoinRewrite (registered via
    // GraftExtensions) detects the two-sided bound and rewrites it to the
    // banded form: bucket the time axis to the range width, equi-join on
    // (key, bucket ∈ {b, b+1}), exact predicate on the candidates. One
    // hash shuffle, candidate set ≈ matches, never |L|×|R|. The hand-banded
    // equivalent lives in [[bandedFollowers]] (parity-asserted in
    // RangeJoinRewriteSpec).
    "q_range_join" -> GQuery(
      (s, d) => {
        import s.implicits._
        val e = events(s, d).select($"event_id", $"user_id", $"ts")
        val a = e.select($"event_id", $"user_id".as("ua"), $"ts".as("ta"))
        val b = e.select($"user_id".as("ub"), $"ts".as("tb"))
        a.join(b, $"ua" === $"ub" && $"tb" > $"ta" &&
            $"tb" <= $"ta" + expr("INTERVAL 1 HOUR"))
          .groupBy($"event_id")
          .agg(count(lit(1)).as("n_followers"))
          .orderBy($"event_id")
      },
      Some("""WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t FROM events)
        |SELECT a.event_id, COUNT(*) AS n_followers
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id AND b.t > a.t
        |  AND b.t <= a.t + INTERVAL 1 HOUR
        |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin),
      "banded range join (time-bucket equi-join + exact filter)"),

    // X6 tumbling 1-hour window.
    "q_time_window" -> GQuery(
      (s, d) => {
        import s.implicits._
        events(s, d)
          .groupBy(window($"ts", "1 hour"))
          .agg(count(lit(1)).as("n_events"), dsum6($"value").as("sum_value"))
          .select($"window.start".as("window_start"),
            $"window.end".as("window_end"), $"n_events", $"sum_value")
          .orderBy($"window_start")
      },
      Some(s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
        |  date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL '1 hour' AS window_end,
        |  COUNT(*) AS n_events, ${sqlDsum6("value")} AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start""".stripMargin),
      "tumbling event-time window (extension X6)"),

    // X6 sliding window: 1 hour every 30 minutes — each event lands in 2
    // windows; the oracle materializes both bucket offsets explicitly.
    "q_time_window_slide" -> GQuery(
      (s, d) => {
        import s.implicits._
        events(s, d)
          .groupBy(window($"ts", "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n_events"), dsum6($"value").as("sum_value"))
          .select($"window.start".as("window_start"),
            $"window.end".as("window_end"), $"n_events", $"sum_value")
          .orderBy($"window_start")
      },
      Some(s"""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS t, value FROM events),
        |w AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', t) AS window_start, value FROM e
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', t) - INTERVAL '30 minutes', value FROM e)
        |SELECT window_start, window_start + INTERVAL '1 hour' AS window_end,
        |  COUNT(*) AS n_events, ${sqlDsum6("value")} AS sum_value
        |FROM w GROUP BY window_start ORDER BY window_start""".stripMargin),
      "sliding event-time window (extension X6)"),

    // X6 session windows: 30-minute inactivity gap per user. Spark closes a
    // session when the next event is >= gap after the previous one (window
    // end is exclusive), mirrored by the >= in the oracle's islands pass.
    "q_session_window" -> GQuery(
      (s, d) => {
        import s.implicits._
        events(s, d)
          .groupBy(session_window($"ts", "30 minutes"), $"user_id")
          .agg(count(lit(1)).as("n_events"), dsum6($"value").as("sum_value"))
          .select($"user_id", $"session_window.start".as("session_start"),
            $"session_window.end".as("session_end"), $"n_events", $"sum_value")
          .orderBy($"user_id", $"session_start")
      },
      Some(s"""WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(t) OVER w IS NULL
        |      OR t - lag(t) OVER w >= INTERVAL '30 minutes'
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |g AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, min(t) AS session_start,
        |  max(t) + INTERVAL '30 minutes' AS session_end,
        |  COUNT(*) AS n_events, ${sqlDsum6("value")} AS sum_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin),
      "session windows by inactivity gap (extension X6)"),

    // Sweep-line interval concurrency: treat each event as a 5-minute
    // open interval and report each user's PEAK number of simultaneously
    // open intervals — the overlap-counting shape behind concurrency
    // monitoring and capacity sizing that no plain GROUP BY expresses.
    // Each interval explodes to a (+1 at start, -1 at end) boundary pair;
    // a user-keyed running sum over boundaries is the live count; max of
    // the running sum is the peak. Times travel as micro-second longs
    // (floored the same way on both engines), and boundary ties order
    // (-1 before +1, then event_id) so back-to-back intervals never
    // count as concurrent. One user-keyed exchange end to end.
    "q_sweep_concurrency" -> GQuery(
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"t", $"delta", $"event_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        events(s, d)
          .select($"user_id", $"event_id", unix_micros($"ts").as("t0"))
          .select($"user_id", $"event_id", explode(array(
            struct($"t0".as("t"), lit(1L).as("delta")),
            struct(($"t0" + lit(300000000L)).as("t"), lit(-1L).as("delta"))))
            .as("b"))
          .select($"user_id", $"event_id", $"b.t", $"b.delta")
          .withColumn("live", sum($"delta").over(w))
          .groupBy($"user_id")
          .agg((count(lit(1)) / 2).cast("bigint").as("n_intervals"),
            max($"live").as("peak_concurrent"))
          .orderBy($"user_id")
      },
      Some("""WITH iv AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS t0 FROM events),
        |b AS (
        |  SELECT user_id, event_id, t0 AS t, CAST(1 AS BIGINT) AS delta
        |  FROM iv
        |  UNION ALL
        |  SELECT user_id, event_id, t0 + 300000000, CAST(-1 AS BIGINT)
        |  FROM iv),
        |r AS (
        |  SELECT user_id, delta,
        |    SUM(delta) OVER (PARTITION BY user_id
        |      ORDER BY t, delta, event_id ROWS UNBOUNDED PRECEDING) AS live
        |  FROM b)
        |SELECT user_id,
        |  CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals,
        |  CAST(MAX(live) AS BIGINT) AS peak_concurrent
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin),
      "sweep-line interval concurrency: per-user peak overlap (X6)"),
  )
}
