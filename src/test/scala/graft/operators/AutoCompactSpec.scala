package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Auto-compaction trigger in the store sinks (VERDICT r10 ask #3):
  * with `autoCompactAfter = N`, a threshold-crossing streamed ingest
  * compacts ITSELF (no manual maintenance call), the replay fence
  * (`upToBatchId = batchId - 1`) keeps the in-flight batch replayable,
  * and semantics are untouched — k-batch keep sets still equal the
  * one-shot batch rule, searches still return every vector. */
class AutoCompactSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def files(dir: String): Long = {
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try s.filter(p => p.toString.endsWith(".parquet")).count()
    finally s.close()
  }

  private def sourceDirs(tableDir: String): Seq[Long] =
    new java.io.File(tableDir).listFiles().toSeq.map(_.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)

  test("docSink with autoCompactAfter compacts mid-stream; keep set " +
    "matches an uncompacted twin; fewer files and source dirs") {
    implicit val ctx = spark.sqlContext
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text")
      .unionByName(graft.Tables.load(spark, sf, "documents")
        .orderBy($"doc_id").limit(20)
        .select(($"doc_id" + 100000L).as("doc_id"), $"text"))
      .localCheckpoint()
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val chunks = ids.grouped(math.max(1, ids.length / 5)).toSeq
      .map(g => docs.filter($"doc_id".isin(g: _*))
        .select($"doc_id", $"text").as[(Long, String)].collect().toSeq)

    def ingest(root: String, auto: Int): Unit = {
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val stream = input.toDF.toDF("doc_id", "text")
      chunks.foreach { c =>
        input.addData(c: _*)
        DedupStore.docSink(stream, s"$root/store", s"$root/cp",
          autoCompactAfter = auto).awaitTermination()
      }
    }
    val auto = java.nio.file.Files
      .createTempDirectory("graft_auto_dd").toString
    val plain = java.nio.file.Files
      .createTempDirectory("graft_plain_dd").toString
    ingest(auto, 2)
    ingest(plain, 0)

    def kept(root: String): Set[Long] = DedupStore
      .keptDocs(spark, s"$root/store")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept(auto) == kept(plain), "auto-compaction changed keep set")

    val autoSrcs = sourceDirs(s"$auto/store/sigs")
    assert(autoSrcs.exists(_ < -1L), s"no generation produced: $autoSrcs")
    assert(autoSrcs.count(_ >= -1L) <= 3,
      s"sources not consolidated: $autoSrcs")
    assert(sourceDirs(s"$plain/store/sigs").forall(_ >= -1L))
    assert(files(s"$auto/store") < files(s"$plain/store"),
      s"${files(s"$auto/store")} !< ${files(s"$plain/store")}")
  }

  test("vectorSink with autoCompactAfter consolidates; search complete; " +
    "appendHeldout trigger compacts the gram store") {
    implicit val ctx = spark.sqlContext
    val corpus = graft.Tables.load(spark, sf, "embeddings").localCheckpoint()
    val cents = IvfIndex.centroidsExact(spark, sf)
    val root = java.nio.file.Files
      .createTempDirectory("graft_auto_ivf").toString
    val dir = s"$root/idx"
    val vids = corpus.select($"vec_id").as[Long].collect().sorted
    val vchunks = vids.grouped(math.max(1, vids.length / 5)).toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val stream = input.toDF.toDF("probe_id")
      .join(corpus, $"probe_id" === $"vec_id")
      .select($"vec_id", $"embedding", $"label")
    vchunks.foreach { c =>
      input.addData(c: _*)
      IvfIndex.vectorSink(stream, cents, dir, s"$root/cp",
        autoCompactAfter = 2).awaitTermination()
    }
    val srcs = sourceDirs(dir)
    assert(srcs.exists(_ < -1L), s"no generation produced: $srcs")
    assert(srcs.count(_ >= -1L) <= 3, s"sources not consolidated: $srcs")
    assert(spark.read.parquet(dir).count() == corpus.count(),
      "vectors lost or duplicated across auto-compaction")

    // appendHeldout's batch-side trigger
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").localCheckpoint()
    val droot = java.nio.file.Files
      .createTempDirectory("graft_auto_dc").toString
    val dids = docs.select($"doc_id").as[Long].collect().sorted
    dids.grouped(math.max(1, dids.length / 5)).zipWithIndex.foreach {
      case (g, i) =>
        DecontamStore.appendHeldout(
          docs.filter($"doc_id".isin(g: _*)), i.toLong, droot,
          autoCompactAfter = 2)
    }
    val gsrcs = sourceDirs(s"$droot/grams")
    assert(gsrcs.exists(_ < -1L), s"no generation produced: $gsrcs")
    assert(gsrcs.count(_ >= -1L) <= 3, s"sources not consolidated: $gsrcs")
    // every planted clone still screens as contaminated
    val probe = docs.limit(5)
      .select(($"doc_id" + 5000L).as("doc_id"), $"text")
    val flagged = DecontamStore.screenBatch(probe, droot)
      .filter($"contaminated").count()
    assert(flagged == 5, s"screen broken after auto-compaction: $flagged")
  }
}
