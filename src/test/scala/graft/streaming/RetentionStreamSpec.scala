package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetentionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private lazy val events = graft.Tables.load(spark, dir, "events")
    .select($"event_id", $"user_id", $"ts")

  // raw-row slicing: one user's activity (including their FIRST day)
  // spans batches freely — the direction that breaks frozen-first-seen
  // designs and that the readout-side min must absorb
  private def batches = Seq(
    events.filter(pmod(hash($"event_id"), lit(3)) === 0),
    events.filter(pmod(hash($"event_id"), lit(3)) === 1),
    events.filter(pmod(hash($"event_id"), lit(3)) === 2))

  private def rows(path: String) =
    RetentionStream.retentionFromPartials(spark, path)
      .as[(java.sql.Date, Long, Long)].collect().toSeq

  test("k-batch ingest (with a replay) equals LIVE q_retention " +
    "bit-for-bit — cohorts derived at readout absorb split first days") {
    val incr = Files.createTempDirectory("graft_ret_incr").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      RetentionStream.presencePartials(b, i.toLong, incr)
    }
    // replay batch 1 (failure re-delivery) — must overwrite, not append
    RetentionStream.presencePartials(batches(1), 1L, incr)
    val live = graft.SparkEntry.queries("q_retention")(spark, dir)
      .as[(java.sql.Date, Long, Long)].collect().toSeq
    assert(rows(incr) == live, "streamed retention != live q_retention")
  }

  test("one-shot equals k-batch; offset-0 row is the cohort maximum") {
    val one = Files.createTempDirectory("graft_ret_one").toString
    RetentionStream.presencePartials(events, 0L, one)
    val incr = Files.createTempDirectory("graft_ret_incr2").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      RetentionStream.presencePartials(b, i.toLong, incr)
    }
    val o = rows(one)
    assert(o == rows(incr), "one-shot != k-batch merge")
    // every user is active on their own cohort day, so the offset-0
    // cell IS the cohort size and upper-bounds every later offset
    val byCohort = o.groupBy(_._1)
    byCohort.foreach { case (cohort, cells) =>
      val zero = cells.find(_._2 == 0L)
      assert(zero.isDefined, s"$cohort: missing offset-0 cell")
      cells.foreach { c =>
        assert(c._3 <= zero.get._3,
          s"$cohort offset ${c._2}: ${c._3} > cohort size ${zero.get._3}")
      }
    }
  }
}
