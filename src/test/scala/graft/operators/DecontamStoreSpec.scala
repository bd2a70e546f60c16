package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming decontamination screen: k-batch ingest against the standing
  * heldout gram store must keep exactly the docs the one-shot batch
  * screen (q_prep_funnel stage-5 semantics) keeps; plus store-append
  * growth, replay idempotence, and the never-shuffled standing-scan
  * plan pin. */
class DecontamStoreSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Train/heldout split + planted verbatim leaks (a heldout doc's text
    * re-appearing under a train id — the leakage the screen exists to
    * catch). */
  private def fixtures(): (DataFrame, DataFrame) = {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text")
    val bucket = pmod(conv(substring(md5($"doc_id".cast("string")), 1, 8),
      16, 10), lit(100))
    val held = docs.filter(bucket >= 80)
    val leaks = held.orderBy($"doc_id").limit(6)
      .select(($"doc_id" + 500000L).as("doc_id"), $"text")
    val train = docs.filter(bucket < 80).unionByName(leaks)
    (train.localCheckpoint(), held.localCheckpoint())
  }

  /** One-shot batch screen, computed independently of the store code:
    * contaminated = train docs sharing any 8-gram with heldout. */
  private def batchScreen(train: DataFrame, held: DataFrame): Set[Long] = {
    def g(df: DataFrame) = df
      .select($"doc_id", graft.Fns.tokens($"text").as("toks"))
      .filter(size($"toks") >= 8)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(toks)-7), i -> concat_ws(' ', slice(toks, i, 8)))"))
        .as("sg")).distinct()
    val heldG = g(held).select($"sg").distinct()
    g(train).join(heldG, "sg").select($"doc_id").as[Long].collect().toSet
  }

  test("k-batch streamed ingest == one-shot batch screen") {
    val (train, held) = fixtures()
    val contaminated = batchScreen(train, held)
    assert(contaminated.nonEmpty, "fixture planted no leaks")
    val expectedKept = train.select($"doc_id").as[Long].collect().toSet -- contaminated

    val root = java.nio.file.Files
      .createTempDirectory("graft_decontam").toString
    val store = s"$root/store"
    DecontamStore.appendHeldout(held, -1L, store)

    implicit val ctx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val stream = input.toDF.toDF("doc_id", "text")
    val rows = train.select($"doc_id", $"text").as[(Long, String)]
      .collect().sortBy(_._1)
    val (half1, half2) = rows.splitAt(rows.length / 2)

    input.addData(half1.toSeq: _*)
    DecontamStore.ingestSink(stream, store, s"$root/train", s"$root/cp")
      .awaitTermination()
    input.addData(half2.toSeq: _*)
    DecontamStore.ingestSink(stream, store, s"$root/train", s"$root/cp")
      .awaitTermination()

    val kept = spark.read.parquet(s"$root/train")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == expectedKept,
      s"missing=${(expectedKept -- kept).take(5)} " +
        s"extra=${(kept -- expectedKept).take(5)}")

    // restarted drain with the same checkpoint ingests nothing new
    val n = spark.read.parquet(s"$root/train").count()
    DecontamStore.ingestSink(stream, store, s"$root/train", s"$root/cp")
      .awaitTermination()
    assert(spark.read.parquet(s"$root/train").count() == n)
  }

  test("heldout store grows by append; new grams screen later batches") {
    val (train, held) = fixtures()
    val root = java.nio.file.Files
      .createTempDirectory("graft_decontam_grow").toString
    val store = s"$root/store"
    // split heldout in two; first append only half
    val hIds = held.select($"doc_id").as[Long].collect().sorted
    val h1 = held.filter($"doc_id" <= hIds(hIds.length / 2))
    val h2 = held.filter($"doc_id" > hIds(hIds.length / 2))
    DecontamStore.appendHeldout(h1, -1L, store)

    val flagged1 = DecontamStore.screenBatch(train, store)
      .filter($"contaminated").select($"doc_id").as[Long].collect().toSet
    DecontamStore.appendHeldout(h2, 0L, store)
    val flagged2 = DecontamStore.screenBatch(train, store)
      .filter($"contaminated").select($"doc_id").as[Long].collect().toSet

    assert(flagged1.subsetOf(flagged2))
    assert(flagged2 == batchScreen(train, held),
      "full store must match the one-shot screen")
    assert((flagged2 -- flagged1).nonEmpty,
      "second heldout half should add flags (leaks planted from both)")

    // replaying a heldout append replaces its partitions, never duplicates
    val gramRows = spark.read.parquet(s"$store/grams").count()
    DecontamStore.appendHeldout(h2, 0L, store)
    assert(spark.read.parquet(s"$store/grams").count() == gramRows)
  }

  test("standing gram scan feeds the screen join without an Exchange") {
    val (train, held) = fixtures()
    val root = java.nio.file.Files
      .createTempDirectory("graft_decontam_plan").toString
    val store = s"$root/store"
    DecontamStore.appendHeldout(held, -1L, store)
    val plan = DecontamStore.screenBatch(train.limit(50), store)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    val scanIdx = plan.linesIterator.indexWhere(l =>
      l.contains("Scan parquet") && l.contains("/grams"))
    assert(scanIdx >= 0, plan)
    val above = plan.linesIterator.toSeq.take(scanIdx).reverse
      .takeWhile(l => !l.contains("Join"))
    assert(!above.exists(_.contains("Exchange")),
      s"standing scan shuffled:\n$plan")
  }

  test("append or screen with mismatched parameters is refused") {
    val (train, held) = fixtures()
    val root = java.nio.file.Files
      .createTempDirectory("graft_decontam_param").toString
    val store = s"$root/store"
    DecontamStore.appendHeldout(held, -1L, store)
    val e1 = intercept[IllegalArgumentException] {
      DecontamStore.screenBatch(train.limit(5), store, n = 5)
    }
    assert(e1.getMessage.contains("refusing"))
    val e2 = intercept[IllegalArgumentException] {
      DecontamStore.appendHeldout(held.limit(5), 0L, store, numPfx = 8)
    }
    assert(e2.getMessage.contains("refusing"))
  }

  test("compactStore consolidates heldout batches without changing " +
      "the screen") {
    val (train, held) = fixtures()
    val root = java.nio.file.Files
      .createTempDirectory("graft_decontam_compact").toString
    val store = s"$root/store"
    val hIds = held.select($"doc_id").as[Long].collect().sorted
    val h1 = held.filter($"doc_id" <= hIds(hIds.length / 3))
    val h2 = held.filter($"doc_id" > hIds(hIds.length / 3) &&
      $"doc_id" <= hIds(2 * hIds.length / 3))
    val h3 = held.filter($"doc_id" > hIds(2 * hIds.length / 3))
    DecontamStore.appendHeldout(h1, -1L, store)
    DecontamStore.appendHeldout(h2, 0L, store)
    DecontamStore.appendHeldout(h3, 1L, store)

    val before = DecontamStore.screenBatch(train, store)
      .filter($"contaminated").select($"doc_id").as[Long].collect().toSet
    def files(): Long = {
      val s = java.nio.file.Files.walk(
        java.nio.file.Paths.get(s"$store/grams"))
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    val filesBefore = files()
    val res = DecontamStore.compactStore(spark, store, upToBatchId = 1L)
    assert(res.contains(DedupStore.CompactionResult(-2L, Seq(-1L, 0L, 1L))))
    assert(files() < filesBefore, s"${files()} !< $filesBefore")
    val dirs = new java.io.File(s"$store/grams").listFiles().toSeq
      .map(_.getName).filter(_.startsWith("batch_id="))
    assert(dirs == Seq("batch_id=-2"), dirs.toString)

    val after = DecontamStore.screenBatch(train, store)
      .filter($"contaminated").select($"doc_id").as[Long].collect().toSet
    assert(after == before,
      s"missing=${(before -- after).take(5)} extra=${(after -- before).take(5)}")
    assert(after == batchScreen(train, held))

    // replay fence + nothing further to consolidate
    val e = intercept[IllegalArgumentException] {
      DecontamStore.appendHeldout(h2, 0L, store)
    }
    assert(e.getMessage.contains("compacted"))
    assert(DecontamStore.compactStore(spark, store, 5L).isEmpty)
  }

  test("screen with no store yet flags nothing") {
    val (train, _) = fixtures()
    val root = java.nio.file.Files
      .createTempDirectory("graft_decontam_empty").toString
    val out = DecontamStore.screenBatch(train.limit(10), s"$root/none")
    assert(out.filter($"contaminated").isEmpty)
    assert(out.count() == 10)
  }
}
