package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — an operator Spark lacks natively, composed from
  * built-ins per the preference order in SURVEY.md §7.3: union-tag both
  * sides, sort within key by (time, side), carry the right payload forward
  * with a running `last(ignoreNulls)` window, keep left rows.
  *
  * For each left row this yields the most recent right row with
  * `rightTime <= leftTime` in the same key group — without a range-join
  * explosion or a per-key loop. Scale shape: ONE shuffle of both inputs by
  * key + a per-partition sort (exactly a sort-merge join's cost); skewed
  * keys fall to AQE or [[Skew]] salting like any keyed shuffle.
  */
object AsOf {

  /** @param payloadCols right-side columns to attach (must not collide with
    *                    left column names; rename beforehand if they do) */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__src", lit(1))
    val r = right
      .select((key +: rightTime +: payloadCols).map(col): _*)
      .withColumn("__t", col(rightTime))
      .withColumn("__src", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal time: ties are inclusive
    // (rightTime <= leftTime), matching ASOF semantics
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__src") === 1)
      .drop("__t", "__src", rightTime)
  }

  /** The same join through graft's NATIVE physical operator
    * ([[graft.plans.AsOfJoinExec]] — logical node + strategy + exec,
    * registered by GraftExtensions, which the session must load): each
    * side shuffles once by key and merges in a single streaming pass with
    * O(1) state, instead of union-sorting both sides and running a window
    * per payload column. Semantics are identical to [[asofJoin]]
    * (ties inclusive, no match → nulls) — asserted by AsOfJoinExecSpec
    * parity tests and the shared q_asof_join oracle. */
  def asofJoinNative(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String]): DataFrame =
    asofJoinNativeKeys(left, right, Seq(key), leftTime, rightTime,
      payloadCols)

  /** Multi-equi-key native as-of join (the [[graft.plans.AsOfJoinNode]]
    * already carries Seq keys; this exposes it). */
  def asofJoinNativeKeys(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graftshim.Bridge
    val lp = Bridge.analyzed(left)
    val rp = Bridge.analyzed(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"column $n not found in ${p.output.map(_.name).mkString(",")}"))
    Bridge.ofRows(left.sparkSession, graft.plans.AsOfJoinNode(
      lp, rp,
      keys.map(attr(lp, _)), keys.map(attr(rp, _)),
      attr(lp, leftTime), attr(rp, rightTime),
      payloadCols.map(attr(rp, _))))
  }

  /** Hot-key mitigation for the native as-of join. AQE's skew-join split
    * only rewrites the two built-in shuffled joins (SortMergeJoinExec /
    * ShuffledHashJoinExec) — a custom exec's exchanges get placed, reused
    * and COALESCED by AQE but never skew-split — so the scale story for a
    * dominant key is the operator-level one: salt the LEFT side into
    * `buckets` deterministic slices (hash of the left row's time) and
    * replicate each right key group into every bucket. Every left row
    * still sees the full right history for its key, so results are
    * row-identical to [[asofJoinNative]] (SkewedAsOfSpec parity); the hot
    * key's left partition is now `buckets`-way parallel at the cost of
    * `buckets`× the (typically far smaller) right side's shuffle bytes —
    * the classic replicate-the-build skew trade. */
  def asofJoinSalted(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      buckets: Int = 8): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val l = left.withColumn("__salt",
      pmod(xxhash64(col(leftTime)), lit(buckets.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    asofJoinNativeKeys(l, r, Seq(key, "__salt"), leftTime, rightTime,
      payloadCols)
      .drop("__salt")
  }

  val queries: Seq[(String, GQuery)] = Seq(
    // For each event, the customer's most recent order on/before the event
    // time. Orders deduped to one per (custkey, date) first so the match is
    // deterministic on both engines (ASOF ties are otherwise unspecified).
    "q_asof_join" -> GQuery(
      (s, d) => {
        import s.implicits._
        val events = Tables.load(s, d, "events")
          .select($"event_id", $"user_id", $"ts")
        val orders = Tables.load(s, d, "orders")
          .groupBy($"o_custkey".as("user_id"), $"o_orderdate")
          .agg(max($"o_orderkey").as("last_orderkey"))
        // through the native AsOfJoinExec operator — the oracle match IS
        // the correctness gate for the custom physical plan
        asofJoinNative(events, orders, "user_id", "ts", "o_orderdate",
          Seq("last_orderkey"))
          .select($"event_id", $"user_id", $"last_orderkey")
          .orderBy($"event_id")
      },
      Some(asofOracle),
      "as-of backward join via the NATIVE AsOfJoinExec operator"),

    // The same semantics through the built-ins-only formulation, against
    // the same oracle — keeps both paths verified and makes the bench
    // show the native operator's advantage side by side.
    "q_asof_join_window" -> GQuery(
      (s, d) => {
        import s.implicits._
        val events = Tables.load(s, d, "events")
          .select($"event_id", $"user_id", $"ts")
        val orders = Tables.load(s, d, "orders")
          .groupBy($"o_custkey".as("user_id"), $"o_orderdate")
          .agg(max($"o_orderkey").as("last_orderkey"))
        asofJoin(events, orders, "user_id", "ts", "o_orderdate",
          Seq("last_orderkey"))
          .select($"event_id", $"user_id", $"last_orderkey")
          .orderBy($"event_id")
      },
      Some(asofOracle),
      "as-of backward join via union-tag running-last (SURVEY.md §7.3)"),
  )

  private lazy val asofOracle = """WITH od AS (
    |  SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS last_orderkey
    |  FROM orders GROUP BY 1, 2),
    |e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t FROM events)
    |SELECT e.event_id, e.user_id, od.last_orderkey
    |FROM e ASOF LEFT JOIN od
    |  ON e.user_id = od.user_id AND e.t >= od.o_orderdate
    |ORDER BY e.event_id""".stripMargin
}
