package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

class DispersionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private lazy val events = graft.Tables.load(spark, dir, "events")

  // slice by event id so most (type, user) cells span batches — the
  // merge must reassemble per-user counts from partial sums
  private def batches = Seq(
    events.filter($"event_id" % 3 === 0),
    events.filter($"event_id" % 3 === 1),
    events.filter($"event_id" % 3 === 2))

  private def rows(path: String) =
    DispersionStream.dispersionFromPartials(spark, path)
      .as[(String, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq.sortBy(_._1)

  test("k-batch ingest (with a replay) equals one-shot equals LIVE " +
    "q_negbin_fit bit-for-bit") {
    val incr = Files.createTempDirectory("graft_disp_incr").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      DispersionStream.countPartials(b, i.toLong, incr)
    }
    // replay batch 2 (failure re-delivery) — must overwrite, not double
    DispersionStream.countPartials(batches(2), 2L, incr)
    val oneShot = Files.createTempDirectory("graft_disp_one").toString
    DispersionStream.countPartials(events, 0L, oneShot)

    val a = rows(incr)
    val b = rows(oneShot)
    assert(a == b, "incremental != one-shot")

    val live = graft.SparkEntry.queries("q_negbin_fit")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq.sortBy(_._1)
    assert(a == live, "streamed != live q_negbin_fit")
  }

  test("machine-regular traffic collapses the dispersion index " +
    "toward 1") {
    // bursty humans: user k fires ~2k+1 events (heavy skew); then a
    // bot fleet appears where EVERY user fires exactly 3 events
    val human = (0 until 400).map(i =>
      (s"u", math.sqrt(i.toDouble).toLong, "click"))
    val bots = (0 until 3000).map(i =>
      (s"b", 1000L + i / 3, "click"))
    def write(rows: Seq[(String, Long, String)], tag: String) = {
      val p = Files.createTempDirectory(s"graft_disp_$tag").toString
      DispersionStream.countPartials(
        rows.toDF("pad", "user_id", "event_type"), 0L, p)
      p
    }
    val humanOnly = rows(write(human, "h")).head
    val mixed = rows(write(human ++ bots, "m")).head
    assert(humanOnly._5 > mixed._5,
      s"bot fleet did not reduce dispersion: ${humanOnly._5} -> ${mixed._5}")
    // the bot-dominated mix sits near the Poisson line
    assert(mixed._5 < humanOnly._5 / 2)
  }
}
