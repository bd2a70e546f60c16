package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private lazy val events = graft.Tables.load(spark, dir, "events")

  // the batch q_psi's own derived split (min day + 14), fed back to
  // the monitor as its explicit cutoff parameter so the two tiers
  // compute over identical halves
  private lazy val cutoff: String = events
    .filter($"value".isNotNull)
    .agg(date_add(min(to_date($"ts")), 14).cast("string"))
    .as[String].head()

  // slice by event id so every (half, bin) cell spans batches
  private def batches = Seq(
    events.filter($"event_id" % 3 === 0),
    events.filter($"event_id" % 3 === 1),
    events.filter($"event_id" % 3 === 2))

  private def psiOf(path: String): (Long, Double) =
    DriftStream.psiFromPartials(spark, path)
      .as[(Long, Double)].collect().head

  test("k-batch ingest (with a replay) equals one-shot equals the " +
    "LIVE batch q_psi bit-for-bit") {
    val incr = Files.createTempDirectory("graft_drift_incr").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      DriftStream.binPartials(b, i.toLong, incr, cutoff)
    }
    // replay batch 2 (failure re-delivery) — must overwrite, not double
    DriftStream.binPartials(batches(2), 2L, incr, cutoff)
    val oneShot = Files.createTempDirectory("graft_drift_one").toString
    DriftStream.binPartials(events, 0L, oneShot, cutoff)

    val a = psiOf(incr)
    val b = psiOf(oneShot)
    assert(a == b, s"incremental $a != one-shot $b")

    val live = graft.SparkEntry.queries("q_psi")(spark, dir)
      .as[(Long, Double)].collect().head
    assert(a == live, s"streamed $a != live q_psi $live")
  }

  test("a planted distribution shift moves the streamed PSI above the " +
    "0.25 'major drift' convention") {
    // reference fortnight in bin 0, current period shifted to bin 9
    val rows = (0 until 200).map(i =>
      (s"2024-01-${"%02d".format(i % 10 + 1)} 08:00:00", 10.0)) ++
      (0 until 200).map(i =>
        (s"2024-02-${"%02d".format(i % 10 + 1)} 08:00:00", 480.0))
    val df = rows.toDF("ts_s", "value")
      .select(to_timestamp($"ts_s").as("ts"), $"value")
    val path = Files.createTempDirectory("graft_drift_plant").toString
    DriftStream.binPartials(df, 0L, path, "2024-01-15")
    val (nBins, psi) = psiOf(path)
    assert(nBins == 10L)
    assert(psi > 0.25, s"planted shift not detected: psi = $psi")
  }
}
