package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-bench: native AsOfJoinExec vs the compositional window
  * formulation, with a WIDE payload — the axis that separates them. The
  * window form pays one running-`last` pass per payload column over the
  * union of both sides; the native merge attaches the whole payload row
  * in one pass, so its cost is ~width-independent. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.AsOfBench"
  * Results are recorded in SCALE.md ("as-of payload-width separation").
  */
object AsOfBench {
  private def sink(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val events = Tables.load(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"ts")
    // one right row per (custkey, date); 8 payload columns
    val orders = Tables.load(spark, sfDir, "orders")
      .groupBy($"o_custkey".as("user_id"), $"o_orderdate")
      .agg(
        max($"o_orderkey").as("p1"), max($"o_totalprice").as("p2"),
        max($"o_orderpriority").as("p3"), max($"o_orderstatus").as("p4"),
        avg($"o_totalprice").as("p5"), count(lit(1)).as("p6"),
        min($"o_orderkey").as("p7"), sum($"o_totalprice").as("p8"),
        min($"o_totalprice").as("p9"), stddev_pop($"o_totalprice").as("p10"),
        min($"o_orderpriority").as("p11"), min($"o_orderstatus").as("p12"),
        sum($"o_orderkey").as("p13"), avg($"o_orderkey").as("p14"),
        max(length($"o_orderpriority")).as("p15"),
        count($"o_totalprice").as("p16"))
    val payload = (1 to 16).map(i => s"p$i")

    def time(tag: String)(mk: Int => DataFrame): Seq[(Int, Double)] =
      Seq(1, 4, 8, 16).map { width =>
        val t = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          sink(mk(width))
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"$tag width=$width: $t%.2f s")
        width -> t
      }

    // warm-up both paths once
    sink(operators.AsOf.asofJoinNative(events, orders, "user_id", "ts",
      "o_orderdate", payload.take(1)))
    sink(operators.AsOf.asofJoin(events, orders, "user_id", "ts",
      "o_orderdate", payload.take(1)))

    val native = time("native") { w =>
      operators.AsOf.asofJoinNative(events, orders, "user_id", "ts",
        "o_orderdate", payload.take(w))
    }
    val window = time("window") { w =>
      operators.AsOf.asofJoin(events, orders, "user_id", "ts",
        "o_orderdate", payload.take(w))
    }
    val pairs = native.zip(window).map { case ((w, n), (_, x)) =>
      f""""w$w":{"native":$n%.2f,"window":$x%.2f,"ratio":${x / n}%.2f}"""
    }
    println(pairs.mkString("ASOF_BENCH {", ",", "}"))
    spark.stop()
  }
}
