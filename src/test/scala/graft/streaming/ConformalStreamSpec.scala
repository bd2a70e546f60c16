package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

class ConformalStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private lazy val orders = graft.Tables.load(spark, dir, "orders")

  // slice by order key so most DAYS span batches — the merge has to
  // re-assemble every day's revenue from partial sums
  private def batches = Seq(
    orders.filter($"o_orderkey" % 3 === 0),
    orders.filter($"o_orderkey" % 3 === 1),
    orders.filter($"o_orderkey" % 3 === 2))

  private def readout(path: String): (Long, Long, Long, Long) =
    ConformalStream.conformalFromPartials(spark, path)
      .as[(Long, Long, Long, Long)].collect().head

  test("k-batch ingest (with a replay) equals one-shot equals LIVE " +
    "q_conformal bit-for-bit") {
    val incr = Files.createTempDirectory("graft_conf_incr").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      ConformalStream.dayPartials(b, i.toLong, incr)
    }
    // replay batch 0 (failure re-delivery) — must overwrite, not double
    ConformalStream.dayPartials(batches(0), 0L, incr)
    val oneShot = Files.createTempDirectory("graft_conf_one").toString
    ConformalStream.dayPartials(orders, 0L, oneShot)

    val a = readout(incr)
    val b = readout(oneShot)
    assert(a == b, s"incremental $a != one-shot $b")

    val live = graft.SparkEntry.queries("q_conformal")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().head
    assert(a == live, s"streamed $a != live q_conformal $live")
  }

  test("a planted residual blow-up in the test half collapses coverage") {
    // 70 days; eligible days are 7..69 so the median split lands ~38.
    // Calibration (<= 38) keeps a tight weekly pattern (day-7 residual
    // exactly 0 -> q95 = 0); from day 45 revenue explodes on a 5-day
    // cycle that beats against the 7-day lag, so test residuals are
    // large and coverage collapses.
    val rows = (0 until 140).map { i =>
      val d = i / 2
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(d)
      val amount =
        if (d < 45) 100.0 + (d % 7) else 10000.0 * (1 + d % 5)
      (s"$day 00:00:00", amount)
    }
    val df = rows.toDF("d_s", "o_totalprice")
      .select(org.apache.spark.sql.functions.to_timestamp($"d_s")
        .as("o_orderdate"), $"o_totalprice")
    val path = Files.createTempDirectory("graft_conf_plant").toString
    ConformalStream.dayPartials(df, 0L, path)
    val (_, nTest, _, cov) = readout(path)
    assert(nTest > 0)
    assert(cov < 900000L, s"planted blow-up not caught: coverage $cov")
  }
}
