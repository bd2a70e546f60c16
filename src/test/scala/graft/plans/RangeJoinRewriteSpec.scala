package graft.plans

import graft.SparkSpec
import graft.operators.TimeWindows
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A Dataset memoizes its QueryExecution, so every plan-sensitive check
  * below REBUILDS the join inside the `withRule` block — reusing one
  * DataFrame across conf flips would silently compare a plan to itself. */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  // dense enough that every case has real matches: 3k events across 20
  // keys, ~45s apart per key
  private lazy val ev = (0 until 3000)
    .map(i => (i.toLong, i % 20, i.toLong * 9 + (i % 7) * 131))
    .toDF("id", "k", "sec")
    .select($"id", $"k", timestamp_seconds($"sec").as("ts"))
    .cache()

  private def withRule[A](on: Boolean)(f: => A): A = {
    spark.conf.set("spark.graft.rangeJoin.enabled", on.toString)
    try f finally spark.conf.set("spark.graft.rangeJoin.enabled", "true")
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def naiveEqui: DataFrame = {
    val a = ev.select($"id".as("aid"), $"k".as("ka"), $"ts".as("ta"))
    val b = ev.select($"id".as("bid"), $"k".as("kb"), $"ts".as("tb"))
    a.join(b, $"ka" === $"kb" && $"tb" > $"ta" &&
      $"tb" <= $"ta" + expr("INTERVAL 2 MINUTES"))
  }

  private def pureRange: DataFrame = {
    val a = ev.select($"id".as("aid"), $"ts".as("ta"))
    val b = ev.select($"id".as("bid"), $"ts".as("tb"))
    a.join(b, $"tb" > $"ta" && $"tb" <= $"ta" + expr("INTERVAL 1 MINUTE"))
  }

  private def numericBand: DataFrame = {
    val a = ev.select($"id".as("aid"))
    val b = ev.select($"id".as("bid"))
    a.join(b, $"bid" > $"aid" && $"bid" <= $"aid" + lit(25L))
  }

  private def mirrored: DataFrame = {
    val a = ev.select($"id".as("aid"), $"ts".as("ta"))
    val b = ev.select($"id".as("bid"), $"ts".as("tb"))
    // ta in [tb - 90s, tb): same region written from the left side
    a.join(b, $"ta" >= $"tb" - expr("INTERVAL 90 SECONDS") && $"ta" < $"tb")
  }

  test("equi+range join: rewrite fires, result identical to rule-off run") {
    val on = withRule(on = true)(rows(naiveEqui))
    val off = withRule(on = false)(rows(naiveEqui))
    assert(on.nonEmpty, "test data produced no matches — dead test")
    assert(on == off)
    withRule(on = true) {
      val plan = naiveEqui.queryExecution.optimizedPlan.treeString
      assert(plan.contains("__graft_band"), s"rewrite did not fire:\n$plan")
    }
  }

  test("pure range join (no equi keys): BNLJ replaced by a hash join") {
    val on = withRule(on = true)(rows(pureRange))
    val off = withRule(on = false)(rows(pureRange))
    assert(on.nonEmpty && on == off)
    withRule(on = true) {
      val phys = pureRange.queryExecution.executedPlan.treeString
      assert(!phys.contains("NestedLoop"),
        s"pure range join still nested-loop:\n$phys")
      assert(phys.contains("__graft_band"))
    }
    withRule(on = false) {
      val phys = pureRange.queryExecution.executedPlan.treeString
      assert(phys.contains("NestedLoop"),
        "control: naive plan should be BNLJ when the rule is off")
    }
  }

  test("numeric bounded band join rewrites too") {
    val on = withRule(on = true)(rows(numericBand))
    val off = withRule(on = false)(rows(numericBand))
    assert(on.nonEmpty && on == off)
    withRule(on = true) {
      assert(!numericBand.queryExecution.executedPlan.treeString
        .contains("NestedLoop"))
    }
  }

  test("mirrored operand order and subtraction offsets are recognized") {
    val on = withRule(on = true)(rows(mirrored))
    val off = withRule(on = false)(rows(mirrored))
    assert(on.nonEmpty && on == off)
    withRule(on = true) {
      assert(mirrored.queryExecution.optimizedPlan.treeString
        .contains("__graft_band"))
    }
  }

  test("date-typed calendar band join rewrites (date_sub offsets)") {
    // a 90-day spine with gaps — the q_ewma shape: b.day in
    // [a.day - 29d, a.day], DATE attrs on both sides, offsets in days
    def dateBand = {
      val days = (0 until 90).filter(i => i % 7 != 3)
        .map(i => Tuple1(i)).toDF("i")
        .select(date_add(lit(java.sql.Date.valueOf("2024-01-01")), $"i")
          .as("day"))
      val a = days.select($"day")
      val b = days.select($"day".as("bday"))
      a.join(b, $"bday" >= date_sub($"day", 29) && $"bday" <= $"day")
    }
    val on = withRule(on = true)(rows(dateBand))
    val off = withRule(on = false)(rows(dateBand))
    assert(on.nonEmpty && on == off)
    withRule(on = true) {
      val phys = dateBand.queryExecution.executedPlan.treeString
      assert(!phys.contains("NestedLoop"),
        s"date band join still nested-loop:\n$phys")
      assert(phys.contains("__graft_band"))
    }
  }

  test("date columns compared through INTERVAL (micros domain) are left " +
      "alone — banding must never mix day and micro units") {
    // Spark implicitly casts DATE to TIMESTAMP against an interval bound:
    // the comparison is in micros while a date attr bands in days. The
    // rule must NOT fire here (a mixed-unit envelope would be ~1e11 days
    // off and return an empty join); correctness over coverage.
    val days = (0 until 60).map(Tuple1(_)).toDF("i")
      .select(date_add(lit(java.sql.Date.valueOf("2024-01-01")), $"i")
        .as("day"))
    val a = days.select($"day")
    val b = days.select($"day".as("bday"))
    def j = a.join(b,
      $"bday".cast("timestamp") >= $"day".cast("timestamp") -
        expr("INTERVAL 36 HOURS") &&
      $"bday".cast("timestamp") <= $"day".cast("timestamp") -
        expr("INTERVAL 12 HOURS"))
    val on = withRule(on = true)(rows(j))
    val off = withRule(on = false)(rows(j))
    assert(on.nonEmpty && on == off,
      s"mixed-unit rewrite corrupted results: ${on.size} vs ${off.size}")
  }

  test("rewrite is idempotent: exactly one band pair in the plan") {
    withRule(on = true) {
      val plan = naiveEqui.queryExecution.optimizedPlan.treeString
      assert(plan.contains("__graft_band#"))
      assert(!plan.contains("__graft_band_r_r"),
        "rule re-fired on its own output")
      val generates = "Generate explode".r.findAllIn(plan).size
      assert(generates == 1, s"expected 1 Generate, got $generates:\n$plan")
    }
  }

  test("null timestamps: banded result still matches the naive join") {
    val withNulls = ev.withColumn("ts",
      when($"id" % 11 === 0, lit(null).cast("timestamp")).otherwise($"ts"))
    def j = {
      val a = withNulls.select($"id".as("aid"), $"ts".as("ta"))
      val b = withNulls.select($"id".as("bid"), $"ts".as("tb"))
      a.join(b, $"tb" > $"ta" && $"tb" <= $"ta" + expr("INTERVAL 1 MINUTE"))
    }
    val on = withRule(on = true)(rows(j))
    val off = withRule(on = false)(rows(j))
    assert(on.nonEmpty && on == off,
      "null-ts rows must drop out identically under the rewrite")
  }

  test("one-sided ranges and outer joins are left alone") {
    val a = ev.select($"id".as("aid"), $"ts".as("ta"))
    val b = ev.select($"id".as("bid"), $"ts".as("tb"))
    withRule(on = true) {
      val oneSided = a.join(b, $"tb" > $"ta")
      assert(!oneSided.queryExecution.optimizedPlan.treeString
        .contains("__graft_band"))
      val outer = a.join(b, $"tb" > $"ta" &&
        $"tb" <= $"ta" + expr("INTERVAL 1 MINUTE"), "left")
      assert(!outer.queryExecution.optimizedPlan.treeString
        .contains("__graft_band"))
    }
  }

  test("q_range_join (naive form) matches the hand-banded reference") {
    val dir = "/root/testdata/sf0.001"
    val auto = withRule(on = true)(
      TimeWindows.queries.toMap.apply("q_range_join").fn(spark, dir))
    val autoRows = withRule(on = true)(rows(auto))
    val manual = withRule(on = false)(
      rows(TimeWindows.bandedFollowers(spark, dir)))
    assert(autoRows == manual && manual.nonEmpty)
    val plan = auto.queryExecution.optimizedPlan.treeString
    assert(plan.contains("__graft_band"), "naive q_range_join not rewritten")
  }
}
