package graft.io

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def partFiles(root: String, part: String): Map[String, Long] = {
    val dir = new File(s"$root/$part")
    dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("upsert rewrites only touched partitions, last version wins") {
    val root = Files.createTempDirectory("graft_upsert").toString + "/t"
    (1 to 1000).map(i => (i.toLong, s"day${i % 4}", s"v0_$i", 0L))
      .toDF("id", "day", "payload", "version")
      .write.partitionBy("day").parquet(root)

    val untouchedBefore = partFiles(root, "day=day3")

    val updates = Seq(
      (1L, "day1", "v1_1", 1L),       // update an existing key
      (2L, "day2", "stale", -1L),     // stale update must LOSE
      (9001L, "day1", "v1_new", 1L))  // brand-new key
      .toDF("id", "day", "payload", "version")

    val n = Upsert.mergeByKey(spark, root, updates,
      keyCols = Seq("id", "day"), partitionCol = "day",
      versionCol = "version")
    assert(n == 2, s"expected 2 touched partitions, got $n")

    val after = spark.read.parquet(root)
    assert(after.count() == 1001) // one insert
    val got = after.filter($"id".isin(1L, 2L, 9001L))
      .select($"id", $"payload").as[(Long, String)].collect().toMap
    assert(got(1L) == "v1_1", "newer version must replace")
    assert(got(2L) == "v0_2", "stale update must not replace")
    assert(got(9001L) == "v1_new", "insert must appear")

    // untouched partition: exact same files, same mtimes — never rewritten
    assert(partFiles(root, "day=day3") == untouchedBefore,
      "untouched partition was rewritten")

    // no staging residue next to the table
    val parent = new File(root).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains("graft_staging")),
      "staging directory not cleaned up")

    // equal-version tie: the update wins (deterministic rank)
    val tie = Seq((3L, "day3", "tie_update", 0L))
      .toDF("id", "day", "payload", "version")
    Upsert.mergeByKey(spark, root, tie, Seq("id", "day"), "day", "version")
    val v3 = spark.read.parquet(root).filter($"id" === 3L)
      .select($"payload").as[String].head()
    assert(v3 == "tie_update")
  }

  test("the existing-table scan is partition-pruned to the touched set") {
    val root = Files.createTempDirectory("graft_upsert_pp").toString + "/t"
    (1 to 100).map(i => (i.toLong, s"day${i % 4}", 0L))
      .toDF("id", "day", "version")
      .write.partitionBy("day").parquet(root)
    val plan = spark.read.parquet(root)
      .filter($"day" === "day1")
      .queryExecution.executedPlan.toString
    // the pruning mechanism mergeByKey relies on (semi join on the
    // partition column → PartitionFilters, via AQE/DPP or static pruning)
    assert(plan.contains("PartitionFilters") &&
      plan.contains("day1"), plan.take(800))
  }
}
