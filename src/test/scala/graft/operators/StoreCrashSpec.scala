package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The rename-to-log crash window (ADVICE r10): [[StoreLayout.compactTable]]
  * renames a generation into place BEFORE [[StoreLayout.recordCompaction]]
  * writes the log. Each test simulates the crash by running ONLY the
  * compactTable step, then asserts the three contracts the per-generation
  * `_sources.txt` manifest carries:
  *  - duplicate-sensitive reads stay duplicate-free (IvfIndex search),
  *  - append fences refuse compacted batch ids even with no log,
  *  - the next compaction pass heals the log / finishes the pass.
  * The DedupStore case additionally pins the HALF-DONE shape (sigs
  * generation renamed, bands pass never ran): readers must NOT lose
  * bands rows, and recovery deletes the orphan generation and re-runs
  * the pass whole. */
class StoreCrashSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val big = 128L * 1024 * 1024

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def logFile(root: String) =
    new java.io.File(s"$root/_compaction_log.txt")

  test("IvfIndex: crash between generation rename and log write — " +
    "search stays duplicate-free, fence holds, next pass heals") {
    val corpus = graft.Tables.load(spark, sf, "embeddings").localCheckpoint()
    val cents = IvfIndex.centroidsExact(spark, sf)
    val dir = s"${tmp("graft_crash_ivf")}/idx"
    val ids = corpus.select($"vec_id").as[Long].collect().sorted
    val cut = ids(ids.length / 2)
    IvfIndex.appendVectorsIdempotent(
      corpus.filter($"vec_id" <= cut), -1L, cents, dir)
    IvfIndex.appendVectorsIdempotent(
      corpus.filter($"vec_id" > cut), 0L, cents, dir)
    val q = corpus.orderBy($"vec_id").limit(1)
      .select($"embedding").as[Seq[Float]].collect().head.toArray
    def search() = IvfIndex
      .searchCellPartitioned(spark, dir, cents, q, k = 10, nprobe = 3)
      .select($"vec_id").as[Long].collect().toSeq
    val before = search()

    // simulated crash: generation renamed into place, log never written
    StoreLayout.compactTable(spark, dir, "", Seq(-1L, 0L), -2L,
      Seq("cell_id"), Seq("vec_id"), big)
    assert(!logFile(dir).exists(), "log must be absent in the window")
    assert(new java.io.File(s"$dir/batch_id=-2/_sources.txt").exists(),
      "manifest must ride the renamed generation")
    // the window is REAL: a raw read sees every vector twice ...
    assert(spark.read.parquet(dir).count() == 2 * corpus.count())
    // ... but the manifest-aware search result is unchanged
    assert(search() == before, "duplicate hits leaked into top-k")
    // and the append fence holds with no log at all
    val e = intercept[IllegalArgumentException] {
      IvfIndex.appendVectorsIdempotent(corpus.limit(2), 0L, cents, dir)
    }
    assert(e.getMessage.contains("compacted"))

    // next pass heals: log line written, sources deleted, search intact
    assert(IvfIndex.compactIndex(spark, dir, 0L).isEmpty)
    assert(logFile(dir).exists(), "heal must write the missing log line")
    assert(StoreLayout.compactedIds(spark, dir) ==
      Map(-1L -> -2L, 0L -> -2L))
    val dirs = new java.io.File(dir).listFiles().toSeq.map(_.getName)
      .filter(_.startsWith("batch_id="))
    assert(dirs == Seq("batch_id=-2"), dirs.toString)
    assert(search() == before)
    assert(spark.read.parquet(dir).count() == corpus.count())
  }

  test("DecontamStore: crash window — screen verdicts unchanged, fence " +
    "holds, next pass heals") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").localCheckpoint()
    val root = tmp("graft_crash_dc")
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val cut = ids(ids.length / 2)
    DecontamStore.appendHeldout(docs.filter($"doc_id" <= cut), -1L, root)
    DecontamStore.appendHeldout(docs.filter($"doc_id" > cut), 0L, root)
    // probe: half store clones (must flag), half fresh text (must pass)
    val probe = docs.limit(5)
      .select(($"doc_id" + 5000L).as("doc_id"), $"text")
      .unionByName(docs.limit(5).select(($"doc_id" + 6000L).as("doc_id"),
        lit("completely fresh words nowhere in the heldout corpus at all " +
          "zyx wvu tsr qpo nml kji hgf edc ba nine more padding tokens")
          .as("text")))
      .localCheckpoint()
    def verdicts(): Map[Long, Boolean] = DecontamStore
      .screenBatch(probe, root)
      .select($"doc_id", $"contaminated").as[(Long, Boolean)]
      .collect().toMap
    val before = verdicts()
    assert(before.count(_._2) == 5, s"planted leaks must flag: $before")

    StoreLayout.compactTable(spark, root, "grams", Seq(-1L, 0L), -2L,
      Seq("pfx"), Seq("h8"), big)
    assert(!logFile(root).exists())
    assert(verdicts() == before, "screen verdicts changed in the window")
    val e = intercept[IllegalArgumentException] {
      DecontamStore.appendHeldout(docs.limit(3), 0L, root)
    }
    assert(e.getMessage.contains("compacted"))

    assert(DecontamStore.compactStore(spark, root, 0L).isEmpty)
    assert(logFile(root).exists())
    val dirs = new java.io.File(s"$root/grams").listFiles().toSeq
      .map(_.getName).filter(_.startsWith("batch_id="))
    assert(dirs == Seq("batch_id=-2"), dirs.toString)
    assert(verdicts() == before)
  }

  test("DedupStore: HALF-DONE pass (sigs generation only) — appends see " +
    "a consistent store; recovery re-runs the pass whole") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text")
      .unionByName(graft.Tables.load(spark, sf, "documents")
        .orderBy($"doc_id").limit(20)
        .select(($"doc_id" + 100000L).as("doc_id"), $"text"))
      .localCheckpoint()
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val cut = ids(ids.length / 2)
    val b0 = docs.filter($"doc_id" <= cut)
    val b1 = docs.filter($"doc_id" > cut)
    def build(root: String): Unit = {
      DedupStore.appendBatch(b0, -1L, root)
      ()
    }
    val crashed = tmp("graft_crash_dd_a")
    val intact = tmp("graft_crash_dd_b")
    build(crashed); build(intact)
    def kept(root: String): Set[Long] = DedupStore.keptDocs(spark, root)
      .select($"doc_id").as[Long].collect().toSet
    val keptBefore = kept(crashed)
    assert(keptBefore == kept(intact))

    // simulated crash: ONLY the sigs half of the pass ran
    StoreLayout.compactTable(spark, crashed, "sigs", Seq(-1L), -2L,
      Nil, Seq("doc_id"), big)
    // a new batch must reach the SAME verdicts as on the intact twin —
    // the bands reader must not drop source rows no bands generation
    // holds (per-table manifest exclusion)
    val sa = DedupStore.appendBatch(b1, 0L, crashed)
    val sb = DedupStore.appendBatch(b1, 0L, intact)
    assert(sa == sb, s"half-done window changed verdicts: $sa vs $sb")
    assert(kept(crashed) == kept(intact))

    // recovery: orphan generation deleted, pass re-run whole (new gen id)
    val res = DedupStore.compactStore(spark, crashed, upToBatchId = 0L)
    assert(res.contains(DedupStore.CompactionResult(-3L, Seq(-1L, 0L))),
      res.toString)
    for (tbl <- Seq("sigs", "bands")) {
      val gens = new java.io.File(s"$crashed/$tbl").listFiles().toSeq
        .map(_.getName).filter(_.startsWith("batch_id="))
      assert(gens == Seq("batch_id=-3"), s"$tbl: $gens")
    }
    assert(kept(crashed) == kept(intact), "recovery changed the keep set")
  }
}
