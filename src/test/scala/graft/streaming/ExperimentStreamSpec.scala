package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

class ExperimentStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private lazy val events = graft.Tables.load(spark, dir, "events")

  // slice by EVENT id so every arm and DiD cell SPANS batches
  private def batches = Seq(
    events.filter($"event_id" % 3 === 0),
    events.filter($"event_id" % 3 === 1),
    events.filter($"event_id" % 3 === 2))

  private def report(path: String): Seq[(String, Long)] =
    ExperimentStream.reportFromPartials(spark, path)
      .as[(String, Long)].collect().toSeq

  test("streamed partials reproduce the LIVE q_experiment_report " +
    "integer-exactly; replay is idempotent; one-shot == incremental") {
    val incr = Files.createTempDirectory("graft_exp_incr").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      ExperimentStream.expPartials(b, i.toLong, incr)
    }
    // replay batch 1 (failure re-delivery) — must overwrite, not double
    ExperimentStream.expPartials(batches(1), 1L, incr)
    val oneShot = Files.createTempDirectory("graft_exp_one").toString
    ExperimentStream.expPartials(events, 0L, oneShot)

    val live = graft.SparkEntry.queries("q_experiment_report")(spark, dir)
      .as[(String, Long)].collect().toSeq
    val streamed = report(incr)
    assert(streamed == live,
      s"streamed $streamed != live $live — partials not associative " +
        "or derivations drifted")
    assert(report(oneShot) == live, "one-shot != live")
  }
}
