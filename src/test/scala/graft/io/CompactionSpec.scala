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
}
