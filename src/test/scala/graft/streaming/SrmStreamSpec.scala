package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

class SrmStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private lazy val events = graft.Tables.load(spark, dir, "events")

  private def batches = Seq(
    events.filter($"event_id" % 3 === 0),
    events.filter($"event_id" % 3 === 1),
    events.filter($"event_id" % 3 === 2))

  private def srmOf(path: String): (Long, Long, Long, Boolean) =
    SrmStream.srmFromPartials(spark, path)
      .as[(Long, Long, Long, Boolean)].collect().head

  test("k-batch ingest (with a replay) equals one-shot equals a " +
    "plain-Scala recount, integer-exact") {
    val incr = Files.createTempDirectory("graft_srm_incr").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      SrmStream.armPartials(b, i.toLong, incr)
    }
    // replay batch 1 (failure re-delivery) — must overwrite, not double
    SrmStream.armPartials(batches(1), 1L, incr)
    val oneShot = Files.createTempDirectory("graft_srm_one").toString
    SrmStream.armPartials(events, 0L, oneShot)

    val a = srmOf(incr)
    val b = srmOf(oneShot)
    assert(a == b, s"incremental $a != one-shot $b")

    // independent recount from raw rows
    val arms = events.select($"user_id" % 2).as[Long].collect()
    val n0 = arms.count(_ == 0L).toLong
    val n1 = arms.count(_ == 1L).toLong
    val chi2 = math.round(
      (n0 - n1).toDouble * (n0 - n1) / (n0 + n1) * 1e6)
    val srm = BigInt(n0 - n1) * BigInt(n0 - n1) * 1000000 >
      BigInt(n0 + n1) * 3841459
    assert(a == ((n0, n1, chi2, srm)), s"streamed $a vs recount")
  }

  test("a planted 10% drop of one arm trips the fence") {
    // 50/50 assignment of 20k exposures, then treated loses every
    // 10th delivery — the classic logging-bug SRM signature
    val rows = (0L until 20000L).filterNot(i => i % 2 == 1 && i % 20 == 1)
      .map(i => i)
    val df = rows.toDF("user_id")
    val path = Files.createTempDirectory("graft_srm_plant").toString
    SrmStream.armPartials(df, 0L, path)
    val (n0, n1, _, srm) = srmOf(path)
    assert(n0 == 10000L && n1 == 9000L)
    assert(srm, "planted mismatch not flagged")

    // and a clean 50/50 split does NOT page
    val clean = Files.createTempDirectory("graft_srm_clean").toString
    SrmStream.armPartials(
      (0L until 20000L).toDF("user_id"), 0L, clean)
    assert(!srmOf(clean)._4, "clean split falsely flagged")
  }
}
