package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnomalyStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private lazy val events = graft.Tables.load(spark, dir, "events")

  // slice by EVENT id so every (type, day) cell SPANS batches — the
  // associativity actually under test
  private def batches = Seq(
    events.filter($"event_id" % 3 === 0),
    events.filter($"event_id" % 3 === 1),
    events.filter($"event_id" % 3 === 2))

  private def rollup(path: String) =
    AnomalyStream.zscoresFromPartials(spark, path)
      .select($"event_type", $"day".cast("string"), $"n", $"mean_micro",
        $"z_micro", $"is_anomaly")
      .as[(String, String, Long, Long, Long, Boolean)].collect().toSeq

  test("k-batch ingest (with a replay) equals one-shot; z-scores match " +
    "an independent recompute straight from events") {
    val incr = Files.createTempDirectory("graft_anom_incr").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      AnomalyStream.momentPartials(b, i.toLong, incr)
    }
    // replay batch 1 (failure re-delivery) — must overwrite, not double
    AnomalyStream.momentPartials(batches(1), 1L, incr)
    val oneShot = Files.createTempDirectory("graft_anom_one").toString
    AnomalyStream.momentPartials(events, 0L, oneShot)

    val a = rollup(incr)
    val b = rollup(oneShot)
    assert(a == b, s"incremental != one-shot")

    // independent recompute: day means frozen to micro, then the same
    // z formula — must match the partials path EXACTLY (all-integer
    // inputs into one identical expression)
    val dm = events
      .select($"event_type", to_date($"ts").as("day"),
        expr("CAST(round(value * 1000000.0, 0) AS BIGINT)").as("v6"))
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).as("n"), sum($"v6").as("s1"))
      .select($"event_type", $"day", $"n",
        expr("CAST(round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 0) " +
          "AS BIGINT)").as("mean_micro"))
      .as[(String, java.sql.Date, Long, Long)].collect()
    val expected = dm.groupBy(_._1).toSeq.flatMap { case (tp, rows) =>
      val nd = rows.length.toLong
      val sm = rows.map(r => BigInt(r._4)).sum
      val sm2 = rows.map(r => BigInt(r._4) * BigInt(r._4)).sum
      val mu = sm.toDouble / nd
      val sd = math.sqrt(sm2.toDouble / nd - mu * mu)
      rows.map { r =>
        val z = math.round((r._4 - mu) / sd * 1e6)
        (tp, r._2.toString, r._3, r._4, z, math.abs(z) > 3000000L)
      }
    }.toSeq.sortBy(r => (r._1, r._2))
    assert(a == expected, s"partials path != direct recompute")
  }

  test("a planted 100x-volume day trips the 3-sigma fence; quiet days " +
    "do not") {
    // 14 quiet days at value ~1.0 plus one day with a 100x mean spike
    val rows = (0 until 14).flatMap { day =>
      (0 until 50).map(i =>
        (s"2024-03-${"%02d".format(day + 1)} 12:00:00", "m", 1.0 + (i % 3) * 0.01))
    } ++ (0 until 50).map(i => ("2024-03-15 12:00:00", "m", 100.0))
    val df = rows.toDF("ts_s", "event_type", "value")
      .select(to_timestamp($"ts_s").as("ts"), $"event_type", $"value")
    val path = Files.createTempDirectory("graft_anom_plant").toString
    AnomalyStream.momentPartials(df, 0L, path)
    val out = AnomalyStream.zscoresFromPartials(spark, path)
      .select($"day".cast("string"), $"is_anomaly")
      .as[(String, Boolean)].collect().toMap
    assert(out("2024-03-15"), "spiked day not flagged")
    assert(out.count(_._2) == 1,
      s"expected exactly one anomaly, got ${out.filter(_._2)}")
  }

  test("sigma = 0 (one-day and constant-mean types) reads as 'no " +
    "baseline yet': z_micro = 0, is_anomaly = false, never null") {
    // ADVICE r11: a live monitor must not emit NaN/null for exactly
    // the quietest metrics. One type with a single observed day, one
    // with three days of identical means, one normal control.
    val rows =
      Seq(("2024-03-01 12:00:00", "single", 5.0)) ++
        (1 to 3).map(d => (s"2024-03-0$d 12:00:00", "flat", 2.5)) ++
        Seq(("2024-03-01 12:00:00", "ctl", 1.0),
          ("2024-03-02 12:00:00", "ctl", 2.0))
    val df = rows.toDF("ts_s", "event_type", "value")
      .select(to_timestamp($"ts_s").as("ts"), $"event_type", $"value")
    val path = Files.createTempDirectory("graft_anom_sigma0").toString
    AnomalyStream.momentPartials(df, 0L, path)
    val out = AnomalyStream.zscoresFromPartials(spark, path)
      .select($"event_type", $"z_micro", $"is_anomaly")
      .collect()
    assert(out.forall(r => !r.isNullAt(1) && !r.isNullAt(2)),
      s"null z/is_anomaly leaked: ${out.mkString(", ")}")
    val byType = out.groupBy(_.getString(0))
    assert(byType("single").forall(r =>
      r.getLong(1) == 0L && !r.getBoolean(2)))
    assert(byType("flat").forall(r =>
      r.getLong(1) == 0L && !r.getBoolean(2)))
    // the control type still gets real (symmetric, nonzero) z-scores
    assert(byType("ctl").forall(r => r.getLong(1) != 0L))
  }
}
