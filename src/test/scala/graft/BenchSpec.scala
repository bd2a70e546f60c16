package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pins [[Bench.runOne]]'s error contract (VERDICT r10 "What's missing"
  * #3): a query that THROWS must surface as an error, never as a
  * plausible-looking ~0.01 s timing — Bench and Verify run on different
  * SFs, so a silently-swallowed bench throw could mask a broken query
  * for a whole round. */
class BenchSpec extends SparkSpec {

  test("runOne times a working query") {
    val fn = (s: SparkSession, _: String) => {
      import s.implicits._
      Seq(1, 2, 3).toDF("x")
    }
    val r = Bench.runOne(spark, "unused", fn)
    assert(r.isRight)
    assert(r.toOption.get > 0.0)
  }

  test("runOne reports a construction-time throw as Left, not a timing") {
    val fn = (_: SparkSession, _: String) =>
      sys.error("deliberately broken"): DataFrame
    val r = Bench.runOne(spark, "unused", fn)
    assert(r.isLeft)
    assert(r.left.toOption.get.contains("deliberately broken"))
  }

  test("runOne reports an execution-time throw (valid plan, failing task)") {
    val fn = (s: SparkSession, _: String) => {
      import s.implicits._
      // plan is constructible; the failure only happens when tasks run
      Seq(1, 0).toDF("x").selectExpr("CAST(10 / x AS INT) AS y")
    }
    val r = Bench.runOne(spark, "unused", fn)
    assert(r.isLeft, s"divide-by-zero under ANSI must fail the run: $r")
  }

  test("jsonStr escapes quotes, backslashes, and control chars") {
    assert(Bench.jsonStr("a\"b\\c\n") == "\"a\\\"b\\\\c\\u000a\"")
  }

  // r13 VERDICT Next #2: per-rep machine-load capture — five headline
  // queries regressed >30% on untouched code and the record couldn't
  // prove co-tenant noise. These pin that the load fields exist and
  // carry real samples on this (Linux) platform.
  test("loadAvg1 reads a finite nonnegative 1-min load on Linux") {
    val l = Bench.loadAvg1
    assert(!l.isNaN && l >= 0.0, s"unexpected loadavg: $l")
  }

  test("loadPerRepJson emits per-query [pre,post] pairs in rep order") {
    val j = Bench.loadPerRepJson(Seq(
      "q_a" -> Seq((1.25, 2.0), (0.5, 0.75)),
      "q_b" -> Seq((Double.NaN, 3.0))))
    assert(j == """{"q_a":[[1.25,2.00],[0.50,0.75]],""" +
      """"q_b":[[null,3.00]]}""")
  }

  test("loadSummaryJson reports pre min/mean/max and post max") {
    val j = Bench.loadSummaryJson(Seq((1.0, 2.0), (3.0, 1.0)))
    assert(j == """{"n_reps":2,"pre_min":1.00,"pre_mean":2.00,""" +
      """"pre_max":3.00,"post_max":2.00}""")
    assert(Bench.loadSummaryJson(Nil) == """{"n_reps":0}""")
    // all-NaN (non-Linux) degrades to the empty shape, not a crash
    assert(Bench.loadSummaryJson(Seq((Double.NaN, Double.NaN))) ==
      """{"n_reps":0}""")
  }
}
