package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins PlanAudit's global-ordered-window discriminator against LIVE
  * physical plans of each window shape (ADVICE r7: the "], [" string
  * split is brittle against plan-rendering changes — this spec makes a
  * future Spark format change fail the suite loudly instead of silently
  * blinding the gate). */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private lazy val rows = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 40.0)
  ).toDF("id", "grp", "v")

  test("global ordered window (no PARTITION BY) is flagged") {
    val df = rows.withColumn("rn",
      row_number().over(Window.orderBy($"v")))
    assert(PlanAudit.hasGlobalOrderedWindow(planOf(df)),
      s"discriminator missed the global ordered window:\n${planOf(df)}")
  }

  test("partitioned ordered window is NOT flagged") {
    val df = rows.withColumn("rn",
      row_number().over(Window.partitionBy($"grp").orderBy($"v")))
    assert(!PlanAudit.hasGlobalOrderedWindow(planOf(df)),
      s"false positive on partitioned ordered window:\n${planOf(df)}")
  }

  test("partitioned no-order window is NOT flagged") {
    val df = rows.withColumn("n",
      count(lit(1)).over(Window.partitionBy($"grp")))
    assert(!PlanAudit.hasGlobalOrderedWindow(planOf(df)),
      s"false positive on partitioned count window:\n${planOf(df)}")
  }

  test("the plan renderer still draws windows the way the gate assumes") {
    // guard the heuristic's premise itself: a windowed plan must contain
    // a `Window [` line at all — if Spark renames the node, every
    // discriminator answer above would be vacuously "false"
    val df = rows.withColumn("rn",
      row_number().over(Window.orderBy($"v")))
    assert(planOf(df).contains("Window ["),
      "physical plan no longer renders `Window [` — update PlanAudit's " +
        "discriminator for the new format")
  }
}
