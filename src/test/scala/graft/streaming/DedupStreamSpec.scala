package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val base =
    "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  // one word changed out of 14 — most 3-shingles survive
  private val nearCopy =
    "the quick brown fox jumps over the lazy cat near the quiet river bank today"
  private val unrelated =
    "spark query engines shuffle partitioned data across many executor nodes constantly"

  private val batch1 = Seq(
    DocArrival(ts("2024-01-01 10:00:00"), 1L, base),
    DocArrival(ts("2024-01-01 10:00:05"), 5L, unrelated))
  private val batch2 = Seq(
    DocArrival(ts("2024-01-01 10:01:00"), 9L, nearCopy),
    DocArrival(ts("2024-01-01 10:01:30"), 12L, base)) // exact re-post

  test("streaming signature matches the batch q_minhash_sig formulation") {
    // per-row array formulation (stream) vs explode+groupBy (batch oracle
    // path) — same documents, signatures must agree slot-for-slot
    val docs = (batch1 ++ batch2).toDF()
    val perRow = DedupStream.withSignature(docs, "text")
      .select($"doc_id", $"sig")
    val exploded = docs
      .withColumn("toks", graft.Fns.tokens($"text"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(toks)-2), i -> concat_ws(' ', slice(toks, i, 3)))"))
        .as("sh"))
      .withColumn("h", conv(substring(md5($"sh"), 1, 8), 16, 10).cast("long"))
    val mins = graft.operators.Dedup.mhPerms.zipWithIndex.map {
      case ((a, b), i) =>
        min(pmod(lit(a) * $"h" + lit(b),
          lit(graft.operators.Dedup.MhPrime))).as(s"m${i + 1}")
    }
    val batchSig = exploded.groupBy($"doc_id").agg(mins.head, mins.tail: _*)
      .select($"doc_id", array((1 to 8).map(i => col(s"m$i")): _*).as("sig"))
    val a = perRow.as[(Long, Seq[Long])].collect().toMap
    val b = batchSig.as[(Long, Seq[Long])].collect().toMap
    assert(a == b, s"stream=$a batch=$b")
  }

  test("stream hits match the batch-derived LSH truth; unrelated docs stay clean") {
    implicit val ctx = spark.sqlContext
    // ground truth from the shared signature definition: a pair is
    // expected iff the docs share a band bucket AND >= 6 of 8 slots agree,
    // attributed later-arrival -> earlier-arrival (batch order, then
    // doc_id order within a batch — the operator's processing order)
    val arrivals = (batch1.map((0, _)) ++ batch2.map((1, _)))
      .sortBy { case (bi, a) => (bi, a.doc_id) }
    val sigRows = DedupStream.withSignature(
      (batch1 ++ batch2).toDF(), "text")
      .select($"doc_id", $"sig", $"band1", $"band2")
      .as[(Long, Seq[Long], String, String)].collect()
      .map(r => r._1 -> r).toMap
    val expected = (for {
      i <- arrivals.indices; j <- 0 until i
      (_, late) = arrivals(i); (_, early) = arrivals(j)
      (_, sl, b1l, b2l) = sigRows(late.doc_id)
      (_, se, b1e, b2e) = sigRows(early.doc_id)
      if b1l == b1e || b2l == b2e
      m = sl.iterator.zip(se.iterator).count { case (x, y) => x == y }
      if m >= 6
    } yield (late.doc_id, early.doc_id) -> m / 8.0).toMap

    val input = MemoryStream[DocArrival]
    val q = DedupStream.nearDupPairs(input.toDF)
      .writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      val afterB1 = spark.table("neardup").as[NearDupHit].collect()
      assert(afterB1.isEmpty, s"no dups yet: ${afterB1.toSeq}")

      input.addData(batch2: _*); q.processAllAvailable()
      val hits = spark.table("neardup").as[NearDupHit].collect()
        .map(h => (h.doc_id, h.dup_of) -> h.est_sim).toMap

      assert(hits == expected, s"hits=$hits expected=$expected")
      // the exact re-post ALWAYS flags against the original, at 8/8
      assert(hits.get((12L, 1L)).contains(1.0), s"hits=$hits")
      // the unrelated doc neither flags nor is flagged
      assert(!hits.keys.exists(p => p._1 == 5L || p._2 == 5L), s"hits=$hits")
    } finally q.stop()
  }

  test("bucket state caps at MaxBucket but still flags against the prefix") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[DocArrival]
    val q = DedupStream.nearDupPairs(input.toDF)
      .writeStream.format("memory").queryName("neardup_cap")
      .outputMode(OutputMode.Append()).start()
    try {
      // MaxBucket + 10 exact copies of one text: every bucket saturates,
      // later arrivals must still match the retained prefix
      val flood = (1 to DedupStream.MaxBucket + 10).map(i =>
        DocArrival(ts("2024-01-01 10:00:00"), i.toLong, base))
      input.addData(flood: _*); q.processAllAvailable()
      val hits = spark.table("neardup_cap").as[NearDupHit].collect()
      val flagged = hits.map(_.doc_id).toSet
      // every doc after the first is flagged at least once
      assert((2 to DedupStream.MaxBucket + 10).forall(i => flagged(i.toLong)),
        s"missing: ${(2 to DedupStream.MaxBucket + 10).filterNot(i => flagged(i.toLong))}")
    } finally q.stop()
  }
}
