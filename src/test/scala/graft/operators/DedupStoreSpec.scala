package graft.operators

import graft.SparkSpec
import graft.functions.MinHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental near-dup store: the headline pin is BATCH≡INCREMENTAL
  * parity — ingesting the corpus in k idCol-ordered batches keeps exactly
  * the docs the one-shot batch rule keeps ("drop every doc appearing as
  * the larger side of a candidate pair with est_jaccard >= threshold").
  * Plus replay idempotence (the foreachBatch failure-retry path), the
  * store-scan-never-shuffled plan pin, parameter-mismatch refusal, and
  * the streaming sink drain. */
class DedupStoreSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val P = DedupStore.Params()

  /** The one-shot batch keep set under the module's documented rule,
    * computed INDEPENDENTLY of the store code path: full-corpus
    * signatures, candidate pairs via the same banding, est-Jaccard
    * threshold, drop the larger side of every qualifying pair. */
  private def batchKeepSet(docs: DataFrame): Set[Long] = {
    val sigs = MinHash.signatureAgg(docs, "doc_id",
      graft.Fns.tokens(col("text")), P.shingleSize, P.numHashes)
    val pairs = MinHash.candidatePairs(sigs, "doc_id", "sig",
        P.bands, P.rowsPerBand, maxBucketSize = Int.MaxValue)
      .join(sigs.select($"doc_id".as("id1"), $"sig".as("sig1")), "id1")
      .join(sigs.select($"doc_id".as("id2"), $"sig".as("sig2")), "id2")
      .filter(MinHash.estJaccard($"sig1", $"sig2") >= P.threshold)
    val dropped = pairs.select($"id2").as[Long].collect().toSet
    docs.select($"doc_id").as[Long].collect().toSet -- dropped
  }

  private def docsWithDups(): DataFrame = {
    val base = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text")
    // seed guaranteed near-dups: clones and light edits of real docs, ids
    // above the base range so they are the "later arrivals" that must drop
    val clones = base.orderBy($"doc_id").limit(40)
      .select(($"doc_id" + 100000L).as("doc_id"), $"text")
    val edited = base.orderBy($"doc_id").limit(40)
      .select(($"doc_id" + 200000L).as("doc_id"),
        concat($"text", lit(" tail")).as("text"))
    base.unionByName(clones).unionByName(edited)
  }

  test("incremental ingest in k batches == one-shot batch keep set") {
    val docs = docsWithDups().localCheckpoint()
    val expected = batchKeepSet(docs)

    val root = java.nio.file.Files
      .createTempDirectory("graft_dstore").toString
    // three idCol-ordered batches: store docs are senior to batch docs
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    val b0 = docs.filter($"doc_id" <= cuts(0))
    val b1 = docs.filter($"doc_id" > cuts(0) && $"doc_id" <= cuts(1))
    val b2 = docs.filter($"doc_id" > cuts(1))

    val s0 = DedupStore.appendBatch(b0, -1L, root)
    val s1 = DedupStore.appendBatch(b1, 0L, root)
    val s2 = DedupStore.appendBatch(b2, 1L, root)

    val kept = DedupStore.keptDocs(spark, root)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == expected,
      s"incremental!=batch: only-inc=${(kept -- expected).take(5)} " +
        s"only-batch=${(expected -- kept).take(5)}")
    // the seeded dups actually exercised the cross-batch path
    assert(s1.nDroppedVsStore + s2.nDroppedVsStore > 0,
      s"no cross-batch drops: $s0 $s1 $s2")
    assert(s0.nIn + s1.nIn + s2.nIn == docs.count())
    assert(s0.nKept + s1.nKept + s2.nKept == kept.size.toLong)

    // ...and equals a single-batch ingest of the whole corpus
    val root1 = java.nio.file.Files
      .createTempDirectory("graft_dstore1").toString
    DedupStore.appendBatch(docs, -1L, root1)
    val kept1 = DedupStore.keptDocs(spark, root1)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept1 == expected)
  }

  test("replayed batch overwrites its own partitions and cannot self-match") {
    val docs = docsWithDups().localCheckpoint()
    val root = java.nio.file.Files
      .createTempDirectory("graft_dstore_rp").toString
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val cut = ids(ids.length / 2)
    val b0 = docs.filter($"doc_id" <= cut)
    val b1 = docs.filter($"doc_id" > cut)

    DedupStore.appendBatch(b0, -1L, root)
    val first = DedupStore.appendBatch(b1, 0L, root)
    val keptBefore = DedupStore.keptDocs(spark, root)
      .select($"doc_id").as[Long].collect().toSet
    val sigRows = spark.read.parquet(s"$root/sigs").count()

    // failure-retry: same batch id, same rows
    val replay = DedupStore.appendBatch(b1, 0L, root)
    assert(spark.read.parquet(s"$root/sigs").count() == sigRows,
      "replay must replace, not duplicate")
    val keptAfter = DedupStore.keptDocs(spark, root)
      .select($"doc_id").as[Long].collect().toSet
    assert(keptAfter == keptBefore)
    // self-exclusion: the replay saw the same standing store as the
    // original run, so its accounting is identical
    assert(replay == first, s"replay=$replay first=$first")
  }

  test("store side of the candidate join is scanned, never shuffled") {
    val docs = docsWithDups().localCheckpoint()
    val root = java.nio.file.Files
      .createTempDirectory("graft_dstore_plan").toString
    DedupStore.appendBatch(docs, -1L, root)

    val batch = docs.limit(25)
    val sigsB = MinHash.signatureAgg(batch, "doc_id",
      graft.Fns.tokens(col("text")), P.shingleSize, P.numHashes)
    val bandsB = sigsB.select($"doc_id",
        explode(MinHash.bandHashes($"sig", P.bands, P.rowsPerBand)).as("bh"))
      .select($"doc_id", $"bh.band".as("band"), $"bh.h".as("h"))
      .withColumn("pfx", pmod($"h", lit(P.numPfx)).cast("int"))
    val cand = DedupStore.candidatesVsStore(spark, sigsB, bandsB, "doc_id",
      root, 7L, P, broadcastBatch = true).get
    val plan = cand.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the standing bands scan must feed the broadcast join directly —
    // no Exchange may sit between the store's FileScan and the join
    val bandScanIdx = plan.linesIterator.indexWhere(l =>
      l.contains("Scan parquet") && l.contains("/bands"))
    assert(bandScanIdx >= 0, plan)
    val above = plan.linesIterator.toSeq.take(bandScanIdx).reverse
      .takeWhile(l => !l.contains("Join"))
    assert(!above.exists(_.contains("Exchange")),
      s"store scan shuffled:\n$plan")
  }

  test("token-less docs pass trivially and are not stored") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_dstore_empty").toString
    val batch = Seq((1L, "real content words here for a doc"),
      (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val st = DedupStore.appendBatch(batch, -1L, root)
    // the two empty docs are NOT near-dups of each other: they pass,
    // uncounted as drops, and leave no signature rows behind
    assert(st == DedupStore.BatchStats(-1L, 3L, 0L, 0L, 3L), st.toString)
    assert(spark.read.parquet(s"$root/sigs").count() == 1L)
  }

  test("hot-bucket cap bounds candidates on boilerplate buckets, " +
      "conservatively (keeps, never drops)") {
    val boiler = "exactly the same boilerplate sentence stamped into " +
      "every single document of this entire corpus shard"
    val P2 = DedupStore.Params(maxBucketSize = 50)
    def clones(from: Long, n: Long): DataFrame =
      spark.range(from, from + n)
        .select($"id".as("doc_id"), lit(boiler).as("text"))

    // vs-store path: 120 identical standing docs -> every band bucket
    // has standing occupancy 120 > 50, so a batch of 10 more clones
    // must see ZERO candidates (bounded, not 120*10) and keep all 10.
    val root = java.nio.file.Files
      .createTempDirectory("graft_dstore_hot").toString
    DedupStore.appendBatch(clones(0L, 50L), -1L, root, params = P2)
    DedupStore.appendBatch(clones(1000L, 70L), 0L, root, params = P2)
    val batch = clones(5000L, 10L).localCheckpoint()
    val sigsB = MinHash.signatureAgg(batch, "doc_id",
      graft.Fns.tokens(col("text")), P2.shingleSize, P2.numHashes)
    val bandsB = sigsB.select($"doc_id",
        explode(MinHash.bandHashes($"sig", P2.bands, P2.rowsPerBand))
          .as("bh"))
      .select($"doc_id", $"bh.band".as("band"), $"bh.h".as("h"))
      .withColumn("pfx", pmod($"h", lit(P2.numPfx)).cast("int"))
    val cand = DedupStore.candidatesVsStore(spark, sigsB, bandsB,
      "doc_id", root, 1L, P2, broadcastBatch = true).get
    assert(cand.count() == 0L, "over-cap standing bucket must be skipped")
    // no store drops (conservative); the 10-clone batch still intra-
    // dedups among itself (its own bucket occupancy 10 <= cap)
    val st = DedupStore.appendBatch(batch, 1L, root, params = P2)
    assert(st.nDroppedVsStore == 0L && st.nDroppedIntra == 9L &&
      st.nKept == 1L, st.toString)

    // intra path: 60 identical docs in ONE batch (> cap) generate no
    // intra pairs; 40 (<= cap) deduplicate down to the senior doc.
    val rootBig = java.nio.file.Files
      .createTempDirectory("graft_dstore_hot2").toString
    val stBig = DedupStore.appendBatch(clones(0L, 60L), -1L, rootBig,
      params = P2)
    assert(stBig.nDroppedIntra == 0L && stBig.nKept == 60L, stBig.toString)
    val rootSmall = java.nio.file.Files
      .createTempDirectory("graft_dstore_hot3").toString
    val stSmall = DedupStore.appendBatch(clones(0L, 40L), -1L, rootSmall,
      params = P2)
    assert(stSmall.nDroppedIntra == 39L && stSmall.nKept == 1L,
      stSmall.toString)

    // determinism: replaying the capped batch reproduces its accounting
    val replay = DedupStore.appendBatch(batch, 1L, root, params = P2)
    assert(replay == st, s"replay=$replay first=$st")
  }

  private def parquetFiles(dir: String): Long = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }
  }

  private def batchDirs(dir: String): Seq[String] = {
    val f = new java.io.File(dir)
    if (!f.exists()) Seq.empty
    else f.listFiles().toSeq.map(_.getName)
      .filter(_.startsWith("batch_id=")).sorted
  }

  test("torn append (sigs without bands) self-heals on the next append") {
    val docs = docsWithDups().localCheckpoint()
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val cut = ids(ids.length / 2)
    val b0 = docs.filter($"doc_id" <= cut)
    val b1 = docs.filter($"doc_id" > cut)

    // reference: clean two-batch ingest
    val rootA = java.nio.file.Files
      .createTempDirectory("graft_dstore_heal_a").toString
    DedupStore.appendBatch(b0, -1L, rootA)
    val ref = DedupStore.appendBatch(b1, 0L, rootA)

    // torn bootstrap: bands partition lost after the sigs write
    val rootB = java.nio.file.Files
      .createTempDirectory("graft_dstore_heal_b").toString
    DedupStore.appendBatch(b0, -1L, rootB)
    val bandDir = new java.io.File(s"$rootB/bands/batch_id=-1")
    assert(bandDir.exists())
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(bandDir)
    assert(!bandDir.exists())

    // the next append rebuilds the torn bands from the stored sigs, so
    // cross-batch candidates (and the accounting) match the clean run
    val healed = DedupStore.appendBatch(b1, 0L, rootB)
    assert(healed == ref, s"healed=$healed reference=$ref")
    assert(bandDir.exists(), "torn bands partition must be rebuilt")
    assert(ref.nDroppedVsStore > 0, "fixture must exercise the store path")
  }

  test("compactStore consolidates batches into a generation without " +
      "changing dedup results") {
    val docs = docsWithDups().localCheckpoint()
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val qs = Seq(ids(ids.length / 4), ids(ids.length / 2),
      ids(3 * ids.length / 4))
    val bs = Seq(
      docs.filter($"doc_id" <= qs(0)),
      docs.filter($"doc_id" > qs(0) && $"doc_id" <= qs(1)),
      docs.filter($"doc_id" > qs(1) && $"doc_id" <= qs(2)),
      docs.filter($"doc_id" > qs(2)))

    // reference: four batches, never compacted
    val rootA = java.nio.file.Files
      .createTempDirectory("graft_dstore_ca").toString
    DedupStore.appendBatch(bs(0), -1L, rootA)
    DedupStore.appendBatch(bs(1), 0L, rootA)
    DedupStore.appendBatch(bs(2), 1L, rootA)
    val lastA = DedupStore.appendBatch(bs(3), 2L, rootA)
    val keptA = DedupStore.keptDocs(spark, rootA)
      .select($"doc_id").as[Long].collect().toSet

    // same ingest, but the first three batches are compacted mid-stream
    val rootB = java.nio.file.Files
      .createTempDirectory("graft_dstore_cb").toString
    DedupStore.appendBatch(bs(0), -1L, rootB)
    DedupStore.appendBatch(bs(1), 0L, rootB)
    DedupStore.appendBatch(bs(2), 1L, rootB)
    val filesBefore =
      parquetFiles(s"$rootB/sigs") + parquetFiles(s"$rootB/bands")
    val res = DedupStore.compactStore(spark, rootB, upToBatchId = 1L)
    assert(res.contains(DedupStore.CompactionResult(-2L, Seq(-1L, 0L, 1L))))
    // file-count assertion: one generation dir per table, fewer files
    assert(batchDirs(s"$rootB/sigs") == Seq("batch_id=-2"))
    assert(batchDirs(s"$rootB/bands") == Seq("batch_id=-2"))
    val filesAfter =
      parquetFiles(s"$rootB/sigs") + parquetFiles(s"$rootB/bands")
    assert(filesAfter < filesBefore, s"$filesAfter !< $filesBefore")

    // the post-compaction append sees identical standing semantics
    val lastB = DedupStore.appendBatch(bs(3), 2L, rootB)
    assert(lastB == lastA, s"compacted=$lastB reference=$lastA")
    val keptB = DedupStore.keptDocs(spark, rootB)
      .select($"doc_id").as[Long].collect().toSet
    assert(keptB == keptA,
      s"only-compacted=${(keptB -- keptA).take(5)} " +
        s"only-ref=${(keptA -- keptB).take(5)}")
    // compacted docs report the generation id; batch 2 keeps its own
    val bids = DedupStore.keptDocs(spark, rootB)
      .select($"batch_id").distinct().as[Long].collect().toSet
    assert(bids == Set(-2L, 2L), bids.toString)

    // a compacted batch id can never be appended (replay fence)
    val e = intercept[IllegalArgumentException] {
      DedupStore.appendBatch(bs(1), 0L, rootB)
    }
    assert(e.getMessage.contains("compacted"))
    // nothing left to consolidate: generation + one live batch
    assert(DedupStore.compactStore(spark, rootB, upToBatchId = 2L).isEmpty)
  }

  test("append with mismatched parameters is refused") {
    val docs = docsWithDups().limit(10)
    val root = java.nio.file.Files
      .createTempDirectory("graft_dstore_meta").toString
    DedupStore.appendBatch(docs, -1L, root)
    val e = intercept[IllegalArgumentException] {
      DedupStore.appendBatch(docs, 0L, root,
        params = DedupStore.Params(numHashes = 32, bands = 8))
    }
    assert(e.getMessage.contains("refusing"))
  }

  test("streaming docSink drains exactly-once and matches batch semantics") {
    implicit val ctx = spark.sqlContext
    val docs = docsWithDups().localCheckpoint()
    val expected = batchKeepSet(docs)
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val cut = ids(ids.length / 2)
    val b0 = docs.filter($"doc_id" <= cut)
    val later = docs.filter($"doc_id" > cut)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq

    val root = java.nio.file.Files
      .createTempDirectory("graft_dstore_stream").toString
    val dir = s"$root/store"
    val cp = s"$root/cp"
    DedupStore.appendBatch(b0, -1L, dir) // bootstrap outside the 0-based ids

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val stream = input.toDF.toDF("doc_id", "text")
    input.addData(later: _*)
    DedupStore.docSink(stream, dir, cp).awaitTermination()

    val kept = DedupStore.keptDocs(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == expected,
      s"only-inc=${(kept -- expected).take(5)} " +
        s"only-batch=${(expected -- kept).take(5)}")

    // a restarted drain with the same checkpoint ingests nothing new
    val rows = spark.read.parquet(s"$dir/sigs").count()
    DedupStore.docSink(stream, dir, cp).awaitTermination()
    assert(spark.read.parquet(s"$dir/sigs").count() == rows)
  }
}
