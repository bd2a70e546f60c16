package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR selection against a persisted importance model: the headline
  * pins are (1) score parity with the oracle-proven `q_dsir` query (the
  * store module must compute exactly the weights the hash-verified query
  * computes) and (2) batch-split invariance of the per-doc selection
  * rule. Plus the no-bigram pass-through contract, parameter refusal,
  * and the stage-6 wiring through [[IncrementalPrep]]. */
class DsirSelectSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def corpus(): (DataFrame, DataFrame) = {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"source", $"lang", $"text")
    (docs.filter($"source" === "src0").localCheckpoint(),
      docs.filter($"source" =!= "src0").localCheckpoint())
  }

  test("selectBatch scores match the oracle-proven q_dsir weights") {
    val (target, pool) = corpus()
    val root = java.nio.file.Files
      .createTempDirectory("graft_dsir_model").toString
    DsirSelect.fitModel(target, pool, root)
    assert(DsirSelect.model(spark, root).count() == 64L)

    val got = DsirSelect.selectBatch(pool, root, minAvgMicro = 0L)
      .filter($"n_bigrams" > 0)
      .select($"doc_id", $"source", $"dsir_w6")
      .orderBy($"dsir_w6".desc, $"doc_id")
      .limit(50)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val want = graft.SparkEntry.queries("q_dsir")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == want, s"got=${got.take(3)} want=${want.take(3)}")
  }

  test("selection is batch-split invariant and replay-deterministic") {
    val (target, pool) = corpus()
    val root = java.nio.file.Files
      .createTempDirectory("graft_dsir_split").toString
    DsirSelect.fitModel(target, pool, root)
    // a threshold that actually bisects the pool
    val thr = 100L
    val oneShot = DsirSelect.selectBatch(pool, root, thr)
      .filter($"selected").select($"doc_id").as[Long].collect().toSet
    val ids = pool.select($"doc_id").as[Long].collect().sorted
    val cut = ids(ids.length / 2)
    val k1 = DsirSelect.selectBatch(pool.filter($"doc_id" <= cut), root, thr)
      .filter($"selected").select($"doc_id").as[Long].collect().toSet
    val k2 = DsirSelect.selectBatch(pool.filter($"doc_id" > cut), root, thr)
      .filter($"selected").select($"doc_id").as[Long].collect().toSet
    assert((k1 ++ k2) == oneShot)
    assert(oneShot.nonEmpty && oneShot.size < ids.length,
      s"threshold must bind: ${oneShot.size}/${ids.length}")
    // replay: identical verdicts
    val again = DsirSelect.selectBatch(pool, root, thr)
      .filter($"selected").select($"doc_id").as[Long].collect().toSet
    assert(again == oneShot)
  }

  test("no-bigram docs pass; mismatched bucket count is refused") {
    val (target, pool) = corpus()
    val root = java.nio.file.Files
      .createTempDirectory("graft_dsir_edge").toString
    DsirSelect.fitModel(target, pool, root)
    val tiny = Seq((1L, "word"), (2L, "")).toDF("doc_id", "text")
    val out = DsirSelect.selectBatch(tiny, root, minAvgMicro = 500000L)
      .select($"doc_id", $"selected", $"n_bigrams")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    assert(out.forall(_._2), out.mkString(","))
    assert(out.forall(_._3 == 0L))
    val e = intercept[IllegalArgumentException] {
      DsirSelect.selectBatch(tiny, root, 0L, buckets = 32)
    }
    assert(e.getMessage.contains("refusing"))
  }

  test("IncrementalPrep stage 6: selection binds and the accounting adds up") {
    val (target, pool) = corpus()
    val modelRoot = java.nio.file.Files
      .createTempDirectory("graft_dsir_prep_model").toString
    DsirSelect.fitModel(target, pool, modelRoot)

    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"lang", $"text").localCheckpoint()

    // reference funnel without selection
    val rootA = java.nio.file.Files
      .createTempDirectory("graft_dsir_prep_a").toString
    val sA = IncrementalPrep.ingestBatch(docs, -1L, rootA)
    assert(sA.nSelectDropped == 0L)

    // with selection: landed = reference survivors that the selector
    // keeps, and the drop count closes the ledger
    val rootB = java.nio.file.Files
      .createTempDirectory("graft_dsir_prep_b").toString
    val thr = 100L
    val sB = IncrementalPrep.ingestBatch(docs, -1L, rootB,
      selectModelPath = Some(modelRoot), selectMinAvgMicro = thr)
    assert(sB.nSelectDropped > 0L, sB.toString)
    assert(sB.nLanded + sB.nSelectDropped == sA.nLanded, s"$sB vs $sA")
    assert(sB.nScreenDropped == sA.nScreenDropped, s"$sB vs $sA")

    val landedA = spark.read.parquet(s"$rootA/train")
      .select($"doc_id").as[Long].collect().toSet
    val landedB = spark.read.parquet(s"$rootB/train")
      .select($"doc_id").as[Long].collect().toSet
    val keptBySelector = DsirSelect
      .selectBatch(docs.join(spark.read.parquet(s"$rootA/train")
        .select($"doc_id"), "doc_id"), modelRoot, thr)
      .filter($"selected").select($"doc_id").as[Long].collect().toSet
    assert(landedB == keptBySelector,
      s"only-funnel=${(landedB -- keptBySelector).take(5)} " +
        s"only-direct=${(keptBySelector -- landedB).take(5)}")
    assert(landedB.subsetOf(landedA))
  }

  test("selectSink streams selection at batch parity, exactly-once") {
    implicit val ctx = spark.sqlContext
    val (target, pool) = corpus()
    val root = java.nio.file.Files
      .createTempDirectory("graft_dsir_sink").toString
    DsirSelect.fitModel(target, pool, s"$root/model")
    val thr = 100L
    val expected = DsirSelect.selectBatch(pool, s"$root/model", thr)
      .filter($"selected").select($"doc_id").as[Long].collect().toSet
    assert(expected.nonEmpty, "threshold must bind for the pin to mean " +
      "anything")

    val rows = pool.select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
    val chunks = rows.grouped(math.max(1, rows.length / 3)).toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val stream = input.toDF.toDF("doc_id", "text")
    chunks.foreach { c =>
      input.addData(c: _*)
      DsirSelect.selectSink(stream, s"$root/model", s"$root/out",
        s"$root/cp", thr).awaitTermination()
    }
    def landed(): Set[Long] = spark.read.parquet(s"$root/out")
      .select($"doc_id").as[Long].collect().toSet
    assert(landed() == expected,
      s"only-stream=${(landed() -- expected).take(5)} " +
        s"only-batch=${(expected -- landed()).take(5)}")

    // a restarted drain with the same checkpoint lands nothing new
    val n = spark.read.parquet(s"$root/out").count()
    DsirSelect.selectSink(stream, s"$root/model", s"$root/out",
      s"$root/cp", thr).awaitTermination()
    assert(spark.read.parquet(s"$root/out").count() == n)
    assert(landed() == expected)
  }
}
