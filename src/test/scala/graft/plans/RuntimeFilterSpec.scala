package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spark's runtime bloom-filter injection (SPARK-32268): a selective
  * filter on one join side becomes a bloom filter applied to the OTHER
  * side's scan, pruning shuffle input at runtime. At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling only
  * rows that can possibly match — worth pinning that our join shapes stay
  * eligible. Size thresholds are lowered here because the test corpus is
  * tiny; on defaults the feature arms itself for >10 MB creation sides. */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("selective dim filter injects a bloom filter on the fact side") {
    val prev = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> spark.conf
        .getOption("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        spark.conf.getOption(
          "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.getOption(
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // creation side must be SMALLER than this; application side LARGER
    // than the scan threshold — tiny test data needs a wide-open window
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    // force a shuffle join: bloom filters target non-broadcast joins
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .filter($"o_orderpriority" === "1-URGENT")
      val j = lineitem.join(orders,
        $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag").agg(sum($"l_quantity").as("q"))
      val plan = j.queryExecution.optimizedPlan.treeString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
