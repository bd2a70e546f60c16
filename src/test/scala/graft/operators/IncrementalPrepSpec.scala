package graft.operators

import graft.SparkSpec
import graft.functions.MinHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental funnel composition: k-batch ingest (+ one finalize
  * pass) must land EXACTLY the one-shot batch funnel's survivors, with
  * the one-shot side computed independently in this spec from the same
  * stage recipes. Plus replay idempotence and the streaming sink. */
class IncrementalPrepSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val P = DedupStore.Params(threshold = 0.7)

  /** Corpus with planted cross-stage dups: exact clones (stage-1 food)
    * and one-token-appended near clones (stage-4 food), ids above the
    * base range so they arrive in later batches. */
  private def fixtures(): DataFrame = {
    val base = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"lang", $"text")
    val longDocs = base.filter($"lang".isin("en", "zh", "de") &&
        size(graft.Fns.tokens($"text")) >= 25)
      .orderBy($"doc_id").limit(30)
    val exactClones = longDocs
      .select(($"doc_id" + 100000L).as("doc_id"), $"lang", $"text")
    val nearClones = longDocs
      .select(($"doc_id" + 200000L).as("doc_id"), $"lang",
        concat($"text", lit(" zz")).as("text"))
    base.unionByName(exactClones).unionByName(nearClones).localCheckpoint()
  }

  /** The one-shot batch funnel, stage by stage, independent of
    * IncrementalPrep's code path. Returns the final train id set plus
    * the per-stage drop counts used for stats cross-checks. */
  private def batchFunnel(docs: DataFrame)
      : (Set[Long], Long, Long) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"fp").orderBy($"doc_id")
    val s1 = docs
      .withColumn("fp", md5(regexp_replace(lower($"text"), "\\s+", " ")))
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .drop("fp", "rn")
    val s3 = s1.filter(size(graft.Fns.tokens($"text")) >= 20 &&
      $"lang".isin("en", "zh", "de"))
    val sigs = MinHash.signatureAgg(s3, "doc_id",
      graft.Fns.tokens($"text"), P.shingleSize, P.numHashes)
    val nearDropped = MinHash.candidatePairs(sigs, "doc_id", "sig",
        P.bands, P.rowsPerBand, maxBucketSize = Int.MaxValue)
      .join(sigs.select($"doc_id".as("id1"), $"sig".as("sig1")), "id1")
      .join(sigs.select($"doc_id".as("id2"), $"sig".as("sig2")), "id2")
      .filter(MinHash.estJaccard($"sig1", $"sig2") >= P.threshold)
      .select($"id2").as[Long].collect().toSet
    val s4 = s3.filter(!$"doc_id".isin(nearDropped.toSeq: _*))
      .withColumn("bucket",
        pmod(conv(substring(md5($"doc_id".cast("string")), 1, 8),
          16, 10), lit(100)))
    def grams(df: DataFrame) = df
      .select($"doc_id", graft.Fns.tokens($"text").as("toks"))
      .filter(size($"toks") >= 8)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(toks)-7), i -> concat_ws(' ', slice(toks, i, 8)))"))
        .as("sg")).distinct()
    val heldG = grams(s4.filter($"bucket" >= 80)).select($"sg").distinct()
    val contaminated = grams(s4.filter($"bucket" < 80))
      .join(heldG, "sg").select($"doc_id").as[Long].collect().toSet
    val train = s4.filter($"bucket" < 80)
      .select($"doc_id").as[Long].collect().toSet -- contaminated
    (train, nearDropped.size.toLong, contaminated.size.toLong)
  }

  test("k-batch ingest + finalize == one-shot batch funnel") {
    val docs = fixtures()
    val (expected, expNear, _) = batchFunnel(docs)
    assert(expNear > 0, "fixture planted no near-dups that bind")

    val root = java.nio.file.Files
      .createTempDirectory("graft_iprep").toString
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    val b0 = docs.filter($"doc_id" <= cuts(0))
    val b1 = docs.filter($"doc_id" > cuts(0) && $"doc_id" <= cuts(1))
    val b2 = docs.filter($"doc_id" > cuts(1))

    val s0 = IncrementalPrep.ingestBatch(b0, -1L, root)
    val s1 = IncrementalPrep.ingestBatch(b1, 0L, root)
    val s2 = IncrementalPrep.ingestBatch(b2, 1L, root)
    val stats = Seq(s0, s1, s2)

    val landed = IncrementalPrep.finalizeScreen(spark, root)
      .select($"doc_id").as[Long].collect().toSet
    assert(landed == expected,
      s"missing=${(expected -- landed).take(5)} " +
        s"extra=${(landed -- expected).take(5)}")

    assert(stats.map(_.nIn).sum == docs.count())
    assert(stats.map(_.nExactDropped).sum == 30L,
      stats.toString) // the 30 exact clones
    assert(stats.map(_.nNearDupDropped).sum == expNear, stats.toString)
    // later batches drop against EARLIER batches' stores
    assert(s1.nExactDropped + s2.nExactDropped > 0)
    assert(s2.nNearDupDropped > 0, stats.toString)
  }

  test("replayed ingest batch leaves every store unchanged") {
    val docs = fixtures()
    val root = java.nio.file.Files
      .createTempDirectory("graft_iprep_rp").toString
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val cut = ids(ids.length / 2)
    IncrementalPrep.ingestBatch(docs.filter($"doc_id" <= cut), -1L, root)
    val b1 = docs.filter($"doc_id" > cut)
    val first = IncrementalPrep.ingestBatch(b1, 0L, root)
    def state() = Seq("fps", "dedup/sigs", "decontam/grams", "train")
      .map(t => t -> spark.read.parquet(s"$root/$t").count()).toMap
    val before = state()
    val trainBefore = spark.read.parquet(s"$root/train")
      .select($"doc_id").as[Long].collect().toSet

    val replay = IncrementalPrep.ingestBatch(b1, 0L, root)
    assert(replay == first, s"replay=$replay first=$first")
    assert(state() == before)
    assert(spark.read.parquet(s"$root/train")
      .select($"doc_id").as[Long].collect().toSet == trainBefore)
  }

  test("streaming sink runs the same funnel exactly-once") {
    implicit val ctx = spark.sqlContext
    val docs = fixtures()
    val (expected, _, _) = batchFunnel(docs)
    val root = java.nio.file.Files
      .createTempDirectory("graft_iprep_stream").toString
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val cut = ids(ids.length / 2)
    IncrementalPrep.ingestBatch(docs.filter($"doc_id" <= cut), -1L,
      s"$root/store")
    val later = docs.filter($"doc_id" > cut)
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)]
      .collect().toSeq

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val stream = input.toDF.toDF("doc_id", "lang", "text")
    input.addData(later: _*)
    IncrementalPrep.sink(stream, s"$root/store", s"$root/cp")
      .awaitTermination()

    val landed = IncrementalPrep.finalizeScreen(spark, s"$root/store")
      .select($"doc_id").as[Long].collect().toSet
    assert(landed == expected,
      s"missing=${(expected -- landed).take(5)} " +
        s"extra=${(landed -- expected).take(5)}")

    // restarted drain ingests nothing new
    val n = spark.read.parquet(s"$root/store/train").count()
    IncrementalPrep.sink(stream, s"$root/store", s"$root/cp")
      .awaitTermination()
    assert(spark.read.parquet(s"$root/store/train").count() == n)
  }
}
