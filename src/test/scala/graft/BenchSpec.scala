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
}
