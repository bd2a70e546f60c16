package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seeded-random scenario sweep for RangeJoinRewrite (the ScalaCheck-style
  * property, run as bounded scenarios in one Spark session): for ANY
  * two-sided bound — random lower offset (negative allowed), random span,
  * strict or inclusive ends, either operand orientation, with or without
  * an equi key, timestamp or integral axis — the rewritten join must (a)
  * actually fire and (b) return exactly the rule-off result. */
class RangeJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(7)

  private lazy val ev = {
    val rows = (0 until 600).map { i =>
      (i.toLong, i % 8, rng.nextInt(1800).toLong)
    }
    rows.toDF("id", "k", "sec")
      .select($"id", $"k", $"sec", timestamp_seconds($"sec").as("ts"))
      .cache()
  }

  private def withRule[A](on: Boolean)(f: => A): A = {
    spark.conf.set("spark.graft.rangeJoin.enabled", on.toString)
    try f finally spark.conf.set("spark.graft.rangeJoin.enabled", "true")
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("parity + rewrite-fired across 12 random bound scenarios") {
    val scenarios = (0 until 12).map { i =>
      val lo = rng.nextInt(180) - 120 // seconds, often negative
      val span = 1 + rng.nextInt(240)
      (i, lo, lo + span, rng.nextBoolean(), rng.nextBoolean(),
        rng.nextBoolean(), rng.nextBoolean())
    }
    scenarios.foreach { case (i, lo, hi, strictLo, strictHi, equi, mirror) =>
      def build: DataFrame = {
        val a = ev.select($"id".as("aid"), $"k".as("ka"), $"ts".as("ta"))
        val b = ev.select($"id".as("bid"), $"k".as("kb"), $"ts".as("tb"))
        val loB = $"ta" + expr(s"INTERVAL $lo SECONDS")
        val hiB = $"ta" + expr(s"INTERVAL $hi SECONDS")
        // d = tb - ta ∈ (lo, hi) with configurable strictness, written
        // from either side of the comparison
        val lower =
          if (mirror) { if (strictLo) loB < $"tb" else loB <= $"tb" }
          else { if (strictLo) $"tb" > loB else $"tb" >= loB }
        val upper =
          if (mirror) { if (strictHi) hiB > $"tb" else hiB >= $"tb" }
          else { if (strictHi) $"tb" < hiB else $"tb" <= hiB }
        val cond = if (equi) $"ka" === $"kb" && lower && upper
          else lower && upper
        a.join(b, cond)
      }
      val on = withRule(on = true)(rows(build))
      val off = withRule(on = false)(rows(build))
      assert(on == off,
        s"scenario $i (lo=$lo hi=$hi sLo=$strictLo sHi=$strictHi " +
          s"equi=$equi mirror=$mirror): ${on.size} vs ${off.size} rows")
      withRule(on = true) {
        assert(build.queryExecution.optimizedPlan.treeString
          .contains("__graft_band"),
          s"scenario $i: rewrite did not fire (lo=$lo hi=$hi mirror=$mirror)")
      }
    }
  }

  test("parity on the integral axis with random numeric bounds") {
    (0 until 4).foreach { i =>
      val lo = rng.nextInt(40) - 20L
      val hi = lo + 1 + rng.nextInt(60)
      def build: DataFrame = {
        val a = ev.select($"id".as("aid"), $"sec".as("sa"))
        val b = ev.select($"id".as("bid"), $"sec".as("sb"))
        a.join(b, $"sb" > $"sa" + lit(lo) && $"sb" <= $"sa" + lit(hi))
      }
      val on = withRule(on = true)(rows(build))
      val off = withRule(on = false)(rows(build))
      assert(on == off, s"numeric scenario $i lo=$lo hi=$hi")
      withRule(on = true) {
        assert(build.queryExecution.optimizedPlan.treeString
          .contains("__graft_band"), s"numeric scenario $i did not fire")
      }
    }
  }
}
