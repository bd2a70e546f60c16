package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class TopKStreamSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish deterministic workload: key i appears ~300/i times, split
  // across two batches (odd/even occurrence index) so every hot key's
  // count must accumulate ACROSS the state boundary to be right.
  private val occurrences: Seq[String] =
    (1 to 40).flatMap(i => Seq.fill(300 / i)(s"key$i"))
  private val batch1 = occurrences.zipWithIndex.collect {
    case (k, j) if j % 2 == 0 => k
  }
  private val batch2 = occurrences.zipWithIndex.collect {
    case (k, j) if j % 2 == 1 => k
  }

  test("streaming heavy hitters: top-10 exact, estimates never " +
    "undercount, state bounded") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = TopKStream.heavyHitters(input.toDS(), buckets = 8,
        maxCandidates = 8)
      .writeStream.format("memory").queryName("hitters")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()

      val exact = occurrences.groupBy(identity).view
        .mapValues(_.length.toLong).toMap
      val top10 = TopKStream.topKFromUpdates(
          spark.table("hitters"), 10)
        .as[(String, Long)].collect().toSeq

      // CMS never undercounts; at this cardinality/width there are no
      // collisions, so estimates are exact and the top-10 matches the
      // true top-10 (count desc, key asc) exactly
      val expected = exact.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
      assert(top10 == expected, s"got $top10\nexpected $expected")
      top10.foreach { case (k, est) =>
        assert(est >= exact(k), s"$k undercounted: $est < ${exact(k)}")
      }

      // candidate-cap boundedness: no single micro-batch emission can
      // exceed buckets x maxCandidates rows (each bucket emits its
      // capped candidate set once per batch) — 2 batches, 8 x 8 cap
      val emitted = spark.table("hitters").count()
      assert(emitted <= 2L * 8 * 8,
        s"$emitted emissions exceed the 2-batch candidate-cap bound")
    } finally q.stop()
  }

  test("a key evicted from candidates is still counted by the sketch " +
    "and can re-enter") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    // 1 bucket, cap 2: 'c' is evicted while 'a'/'b' dominate, then
    // out-counts them — its re-entry estimate must include the
    // pre-eviction occurrences (the CMS remembers what the heap forgot)
    val q = TopKStream.heavyHitters(input.toDS(), buckets = 1,
        maxCandidates = 2)
      .writeStream.format("memory").queryName("hitters2")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Seq.fill(5)("a") ++ Seq.fill(4)("b") ++ Seq("c"): _*)
      q.processAllAvailable()
      input.addData(Seq.fill(10)("c"): _*)
      q.processAllAvailable()
      val top = TopKStream.topKFromUpdates(spark.table("hitters2"), 1)
        .as[(String, Long)].head()
      assert(top == (("c", 11L)), s"got $top — eviction lost counts")
    } finally q.stop()
  }
}
