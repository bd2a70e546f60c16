package graft.io

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction collapses a many-file table and preserves every row") {
    val dir = Files.createTempDirectory("graft_frag").toString
    val out = Files.createTempDirectory("graft_compact").toString + "/t"
    // simulate a fragmented incremental table: 64 tiny files
    (1 to 200000).map(i => (i.toLong, i % 97, s"row$i"))
      .toDF("id", "k", "payload")
      .repartition(64)
      .write.mode("overwrite").parquet(dir)
    val fragFiles = new java.io.File(dir)
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(fragFiles == 64)

    val n = Compaction.compact(spark, dir, out, Seq("id"),
      targetFileBytes = 1L * 1024 * 1024)
    assert(n < 16, s"still $n files")

    val before = spark.read.parquet(dir)
    val after = spark.read.parquet(out)
    assert(after.count() == 200000)
    assert(before.agg(sum($"id")).head().getLong(0) ==
      after.agg(sum($"id")).head().getLong(0))
    // range clustering: each file's id span is disjoint, so a point filter
    // reads one file's worth of row groups — min/max skipping material
    val spans = after
      .select(input_file_name().as("f"), $"id")
      .groupBy($"f").agg(min($"id").as("lo"), max($"id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, "overlapping spans")
      case _ =>
    }
  }

  test("z-order clustering bounds per-file spans on BOTH dimensions") {
    val dir = Files.createTempDirectory("graft_z_in").toString
    val zOut = Files.createTempDirectory("graft_z").toString + "/t"
    val linOut = Files.createTempDirectory("graft_lin").toString + "/t"
    // two independent uniform dims (decorrelated by multiplicative hashing)
    (0 until 200000).map { i =>
      ((i * 2654435761L) % 100000, (i * 40503L) % 100000, i.toLong)
    }.toDF("x", "y", "id")
      .repartition(32).write.mode("overwrite").parquet(dir)

    val nZ = Compaction.compactZ(spark, dir, zOut, Seq("x", "y"),
      targetFileBytes = 128L * 1024)
    Compaction.compact(spark, dir, linOut, Seq("x"),
      targetFileBytes = 128L * 1024)
    assert(nZ >= 8, s"want enough files to measure spans, got $nZ")
    assert(spark.read.parquet(zOut).count() == 200000)

    // fraction of the full domain each file's [min,max] covers, averaged
    def meanSpan(path: String, c: String): Double = {
      val spans = spark.read.parquet(path)
        .select(input_file_name().as("f"), col(c))
        .groupBy($"f").agg((max(col(c)) - min(col(c))).as("span"))
        .collect().map(_.getAs[Long]("span").toDouble / 100000.0)
      spans.sum / spans.length
    }
    val (zx, zy) = (meanSpan(zOut, "x"), meanSpan(zOut, "y"))
    val (lx, ly) = (meanSpan(linOut, "x"), meanSpan(linOut, "y"))
    // linear sort: near-perfect on x, useless on y (~full domain)
    assert(lx < 0.10, s"linear x span $lx")
    assert(ly > 0.90, s"linear y span $ly")
    // z-order: BOTH dimensions bounded well under the full domain
    assert(zx < 0.6 && zy < 0.6, s"z spans x=$zx y=$zy")
    assert(math.max(zx, zy) < ly * 0.6,
      s"z-order no better than linear on the second dim: $zy vs $ly")
  }
}
