package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CiStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private lazy val events = graft.Tables.load(spark, dir, "events")
    .select($"event_id", $"event_type", $"value")

  // raw-row slicing (events of one type span batches freely — the
  // harder direction; counts are sum-associative so it must not matter)
  private def batches = Seq(
    events.filter(pmod(hash($"event_id"), lit(3)) === 0),
    events.filter(pmod(hash($"event_id"), lit(3)) === 1),
    events.filter(pmod(hash($"event_id"), lit(3)) === 2))

  private def rows(path: String) =
    CiStream.wilsonFromPartials(spark, path)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq

  test("k-batch ingest (with a replay) equals LIVE q_wilson_ci " +
    "bit-for-bit — shared expression trees, not a parallel edit") {
    val incr = Files.createTempDirectory("graft_ci_incr").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      CiStream.convPartials(b, i.toLong, incr)
    }
    // replay batch 2 (failure re-delivery) — must overwrite, not append
    CiStream.convPartials(batches(2), 2L, incr)
    val live = graft.SparkEntry.queries("q_wilson_ci")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows(incr) == live, "streamed Wilson CIs != live q_wilson_ci")
  }

  test("one-shot ingest equals k-batch ingest and every CI brackets " +
    "its point estimate") {
    val one = Files.createTempDirectory("graft_ci_one").toString
    CiStream.convPartials(events, 0L, one)
    val incr = Files.createTempDirectory("graft_ci_incr2").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      CiStream.convPartials(b, i.toLong, incr)
    }
    val o = rows(one)
    assert(o == rows(incr), "one-shot != k-batch merge")
    o.foreach { r =>
      assert(r._5 <= r._4 && r._4 <= r._6, s"${r._1}: CI must bracket p")
      assert(r._5 >= 0L, s"${r._1}: Wilson lower bound stays in [0,1]")
      assert(r._6 <= 1000000L, s"${r._1}: Wilson upper bound stays in [0,1]")
    }
  }
}
