package graft.io

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closes the SCALE.md loop on date-partitioned layout: a filter on the
  * partition column must prune at the FILE level (PartitionFilters in the
  * scan), not just push down into row groups. */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned write yields partition-pruned scans") {
    val dir = Files.createTempDirectory("graft_part").toString
    val df = (1 to 1000)
      .map(i => (i.toLong, s"2024-01-0${(i % 5) + 1}", i * 1.0))
      .toDF("id", "day", "v")
    df.write.mode("overwrite").partitionBy("day").parquet(dir)
    val scan = spark.read.parquet(dir).filter($"day" === "2024-01-03")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(1000))
    assert(scan.count() == 200)
    // pruned: only one of five partition directories is read
    val scanNode = plan.linesIterator.find(_.contains("FileScan")).get
    assert(scanNode.contains("day"), scanNode)
  }
}
