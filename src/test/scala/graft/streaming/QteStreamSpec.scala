package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QteStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private lazy val events = graft.Tables.load(spark, dir, "events")
    .select($"event_id", $"user_id", $"value")

  private def batches = Seq(
    events.filter(pmod(hash($"event_id"), lit(3)) === 0),
    events.filter(pmod(hash($"event_id"), lit(3)) === 1),
    events.filter(pmod(hash($"event_id"), lit(3)) === 2))

  private def rows(path: String) =
    QteStream.qteFromPartials(spark, path)
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("k-batch ingest (with a replay) equals LIVE q_qte bit-for-bit — " +
    "grid counts are associative even though quantiles are not") {
    val incr = Files.createTempDirectory("graft_qte_incr").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      QteStream.gridPartials(b, i.toLong, incr)
    }
    // replay batch 0 (failure re-delivery) — must overwrite, not append
    QteStream.gridPartials(batches(0), 0L, incr)
    val live = graft.SparkEntry.queries("q_qte")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows(incr) == live, "streamed QTEs != live q_qte")
  }

  test("one-shot equals k-batch and the quartiles are monotone per arm") {
    val one = Files.createTempDirectory("graft_qte_one").toString
    QteStream.gridPartials(events, 0L, one)
    val incr = Files.createTempDirectory("graft_qte_incr2").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      QteStream.gridPartials(b, i.toLong, incr)
    }
    val o = rows(one)
    assert(o == rows(incr), "one-shot != k-batch merge")
    assert(o.map(_._1) == Seq(25L, 50L, 75L))
    assert(o.map(_._2) == o.map(_._2).sorted, "control quartiles monotone")
    assert(o.map(_._3) == o.map(_._3).sorted, "treated quartiles monotone")
    o.foreach(r => assert(r._4 == r._3 - r._2))
  }
}
