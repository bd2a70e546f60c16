package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The cell-partitioned IVF layout must turn a probe into static partition
  * PRUNING (files outside the probed cells never open) while returning the
  * same rows as filtering the in-memory cell assignment. */
class IvfLayoutSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("probe scans only the probed cell partitions and matches in-memory") {
    val corpus = graft.Tables.load(spark, sf, "embeddings")
    val cents = IvfIndex.centroidsExact(spark, sf)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_layout").toString + "/idx"
    IvfIndex.writeCellPartitioned(corpus, cents, dir)

    val query = corpus.orderBy($"vec_id").limit(1)
      .select($"embedding").as[Array[Float]].head()
    val res = IvfIndex
      .searchCellPartitioned(spark, dir, cents, query, k = 5, nprobe = 2)
    val got = res.select($"vec_id", $"cos").as[(Long, Double)].collect()
    assert(got.length == 5)

    // pruning: the parquet scan carries a partition filter on cell_id and
    // selects a strict subset of the cell directories
    res.collect()
    val plan = res.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children ++ inner).flatMap(flatten)
    }
    val scan = flatten(plan)
      .collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.partitionFilters.exists(_.toString.contains("cell_id")),
      s"no cell_id partition filter in ${scan.partitionFilters}")
    val nCells = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("cell_id="))
    assert(nCells > 2, s"layout should have several cells, got $nCells")
    assert(scan.inputRDDs().map(_.getNumPartitions).sum <= nCells,
      "scan must not fan out past the probed cells")

    // parity: same rows as the in-memory cell-filtered ranking over the
    // SAME probe list the layout search used
    import graft.functions.VectorOps.cosine
    val probed = IvfIndex.probeCells(cents, query, nprobe = 2)
    val expected = IvfIndex.assignCells(corpus, cents)
      .filter($"cell_id".isin(probed: _*))
      .withColumn("cos", cosine($"embedding", typedlit(query)))
      .orderBy($"cos".desc, $"vec_id").limit(5)
      .select($"vec_id", $"cos").as[(Long, Double)].collect()
    assert(got.toSeq == expected.toSeq)
  }

  test("appendVectors: incremental inserts land in their cells, become " +
      "searchable, and report drift stats — no rebuild") {
    val corpus = graft.Tables.load(spark, sf, "embeddings")
    val cents = IvfIndex.centroidsExact(spark, sf)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_append").toString + "/idx"
    IvfIndex.writeCellPartitioned(corpus, cents, dir)
    val before = spark.read.parquet(dir).count()

    // batch of new vectors: exact copies of three existing embeddings
    // under fresh ids — each must join its twin's cell and, being
    // cosine-identical to its twin, rank beside it in a search
    val seed = corpus.orderBy($"vec_id").limit(3)
      .select($"vec_id", $"embedding", $"label").collect()
    val newRows = seed.zipWithIndex.map { case (r, i) =>
      (900000L + i, r.getSeq[Float](1), r.getInt(2))
    }.toSeq
    val batch = newRows.toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>"), $"label")

    val stats = IvfIndex.appendVectors(batch, cents, dir)
      .as[(Int, Long, Double)].collect()
    assert(stats.map(_._2).sum == 3, stats.mkString(","))
    // exact copies sit exactly where their twins sit: cos ~ 1 of their
    // own cell's centroid is not guaranteed, but assignment must match
    // the twin's cell
    val twinCells = IvfIndex.assignCells(corpus, cents)
      .filter($"vec_id".isin(seed.map(_.getLong(0)): _*))
      .select($"cell_id").distinct().as[Int].collect().toSet
    assert(stats.map(_._1).toSet == twinCells,
      s"insert cells ${stats.map(_._1).toSet} vs twin cells $twinCells")

    // the layout grew by exactly the batch, in place
    assert(spark.read.parquet(dir).count() == before + 3)

    // the inserted copy is immediately searchable: querying with a
    // twin's embedding must return the new id in the top-k (identical
    // cosine, ranked right after/with the twin)
    val q = seed.head.getSeq[Float](1).toArray
    val hits = IvfIndex
      .searchCellPartitioned(spark, dir, cents, q, k = 5, nprobe = 2)
      .select($"vec_id").as[Long].collect()
    assert(hits.contains(900000L), s"inserted vector missing from $hits")
  }

  test("streaming vector ingest: exactly-once into the layout, replay " +
      "replaces instead of duplicating, search sees the stream") {
    implicit val ctx = spark.sqlContext
    val corpus = graft.Tables.load(spark, sf, "embeddings")
    val cents = IvfIndex.centroidsExact(spark, sf)
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivf_stream").toString
    val dir = s"$root/idx"
    val cp = s"$root/cp"
    // bootstrap through the idempotent path so the layout is uniform;
    // batch_id = -1 stays outside the streaming id space (foreachBatch
    // ids start at 0 — a 0 bootstrap would be overwritten by the
    // stream's first batch)
    IvfIndex.appendVectorsIdempotent(corpus, -1L, cents, dir)
    val base = spark.read.parquet(dir).count()

    val seed = corpus.orderBy($"vec_id").limit(2)
      .select($"vec_id", $"embedding", $"label").collect()
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float], Int)]
    val stream = input.toDF.toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>"), $"label")

    input.addData(seed.zipWithIndex.map { case (r, i) =>
      (910000L + i, r.getSeq[Float](1), r.getInt(2))
    }.toSeq: _*)
    IvfIndex.vectorSink(stream, cents, dir, cp).awaitTermination()
    assert(spark.read.parquet(dir).count() == base + 2)

    // manual replay of the SAME batch (same id, same rows — the
    // failure-retry path foreachBatch exercises) must REPLACE its
    // partitions, not duplicate
    val replay = seed.zipWithIndex.map { case (r, i) =>
      (910000L + i, r.getSeq[Float](1), r.getInt(2))
    }.toSeq.toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>"), $"label")
    IvfIndex.appendVectorsIdempotent(replay, 0L, cents, dir)
    assert(spark.read.parquet(dir).count() == base + 2,
      "replayed batch must overwrite its own partitions")

    // a restarted drain with the same checkpoint ingests nothing new
    IvfIndex.vectorSink(stream, cents, dir, cp).awaitTermination()
    assert(spark.read.parquet(dir).count() == base + 2)

    // the streamed vector is searchable through the pruned path
    val q0 = seed.head.getSeq[Float](1).toArray
    val hits = IvfIndex
      .searchCellPartitioned(spark, dir, cents, q0, k = 5, nprobe = 2)
      .select($"vec_id").as[Long].collect()
    assert(hits.contains(910000L), s"streamed vector missing from $hits")
  }

  test("compactIndex consolidates micro-batches without changing search") {
    val corpus = graft.Tables.load(spark, sf, "embeddings")
      .localCheckpoint()
    val cents = IvfIndex.centroidsExact(spark, sf)
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivf_compact").toString
    val dir = s"$root/idx"
    val ids = corpus.select($"vec_id").as[Long].collect().sorted
    val (c1, c2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    IvfIndex.appendVectorsIdempotent(
      corpus.filter($"vec_id" <= c1), -1L, cents, dir)
    IvfIndex.appendVectorsIdempotent(
      corpus.filter($"vec_id" > c1 && $"vec_id" <= c2), 0L, cents, dir)
    IvfIndex.appendVectorsIdempotent(
      corpus.filter($"vec_id" > c2), 1L, cents, dir)

    val q = corpus.orderBy($"vec_id").limit(1)
      .select($"embedding").as[Seq[Float]].collect().head.toArray
    def search() = IvfIndex
      .searchCellPartitioned(spark, dir, cents, q, k = 10, nprobe = 3)
      .select($"vec_id").as[Long].collect().toSeq
    val before = search()
    def files(): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    val filesBefore = files()

    val res = IvfIndex.compactIndex(spark, dir, upToBatchId = 1L)
    assert(res.contains(DedupStore.CompactionResult(-2L, Seq(-1L, 0L, 1L))))
    val dirs = new java.io.File(dir).listFiles().toSeq.map(_.getName)
      .filter(_.startsWith("batch_id="))
    assert(dirs == Seq("batch_id=-2"), dirs.toString)
    assert(files() < filesBefore, s"${files()} !< $filesBefore")
    assert(search() == before, "search results must be unchanged")
    assert(spark.read.parquet(dir).count() == corpus.count())

    // replay fence + nothing further to consolidate
    val e = intercept[IllegalArgumentException] {
      IvfIndex.appendVectorsIdempotent(corpus.limit(2), 0L, cents, dir)
    }
    assert(e.getMessage.contains("compacted"))
    assert(IvfIndex.compactIndex(spark, dir, 5L).isEmpty)
  }
}
