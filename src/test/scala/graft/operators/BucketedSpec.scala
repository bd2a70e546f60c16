package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the bucketed-table contract on live plans: the co-located join
  * of two same-bucketed tables carries NO shuffle exchange, while the
  * plain path-based join of the same data carries them — with
  * row-identical results. */
class BucketedSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("co-bucketed orders x lineitem joins with zero Exchange and " +
      "matches the plain join") {
    val orders = spark.read.parquet(s"$d/orders.parquet")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val lineitem = spark.read.parquet(s"$d/lineitem.parquet")
      .select($"l_orderkey".as("o_orderkey"), $"l_quantity",
        $"l_extendedprice")
    Bucketed.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketed.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    try {
      val joined =
        Bucketed.coLocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")

      // the UNBUCKETED twin of the same plan shape shuffles both sides
      val plain = orders.hint("merge").join(lineitem, "o_orderkey")
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning"),
        s"plain merge join should show the shuffle the buckets remove")

      // identical results, row for row
      val a = joined.orderBy($"o_orderkey", $"l_quantity", $"l_extendedprice")
        .collect().map(_.toSeq)
      val b = plain.orderBy($"o_orderkey", $"l_quantity", $"l_extendedprice")
        .collect().map(_.toSeq)
      assert(a.length == b.length && a.toSeq == b.toSeq,
        s"bucketed=${a.length} plain=${b.length}")

      // bucketed AGGREGATION on the key is also exchange-free: the
      // scan's bucket partitioning satisfies the groupBy distribution
      val agg = spark.table("b_lineitem").groupBy($"o_orderkey")
        .agg(sum($"l_quantity").as("q"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        s"bucketed groupBy must not shuffle:\n$aggPlan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  // folded in from the former graft.io.BucketingSpec when the duplicate
  // module was consolidated (round 9): same contract over synthetic data,
  // exercised through the shared isShuffleFree helper
  test("synthetic co-bucketed join is shuffle-free; unbucketed twin is not") {
    val left = (1L to 5000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 5000L).map(i => (i, i * 2.0)).toDF("k", "rv")
    Bucketed.writeBucketed(left, "bkt_left", "k", 4)
    Bucketed.writeBucketed(right, "bkt_right", "k", 4)
    try {
      val joined = Bucketed.coLocatedJoin(spark, "bkt_left", "bkt_right", "k")
      withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        assert(Bucketed.isShuffleFree(joined),
          joined.queryExecution.executedPlan.toString.take(2000))
        assert(joined.count() == 5000)
        assert(!Bucketed.isShuffleFree(left.join(right.hint("merge"), Seq("k"))))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  // the lever on the reference-derived path: XmlPipeline's bucketFact knob
  test("XmlPipeline bucketFact knob: groupBy on the bucketed dim key " +
      "plans zero Exchange") {
    import java.nio.file.Files
    val in = Files.createTempDirectory("graft_bkt_in")
    val out = Files.createTempDirectory("graft_bkt_out")
    val schemas = Files.createTempDirectory("graft_bkt_sch")
    val recs = (1 to 40).map { i =>
      val st = Seq("active", "retired", "pending")(i % 3)
      s"""  <record id="$i" status="$st"><title>T$i</title>""" +
        s"<price>${i}.50</price></record>"
    }.mkString("\n")
    Files.writeString(in.resolve("a.xml"),
      s"<?xml version=\"1.0\"?>\n<catalog>\n$recs\n</catalog>\n")
    try {
      val report = graft.xml.XmlPipeline.process(spark, in.toString,
        out.toString, schemas.toString, runId = 7L,
        loadTs = java.sql.Timestamp.valueOf("2024-03-04 05:06:07"),
        bucketFact = Some(("fact_bucketed_t", "status_key", 4)))
      assert(report.rows == 40)
      // the parquet layout still landed (reference parity)...
      assert(spark.read.parquet(s"$out/fact_main.parquet").count() == 40)
      // ...and the bucketed copy aggregates on its key with no shuffle
      val agg = spark.table("fact_bucketed_t").groupBy($"status_key")
        .agg(count(lit(1)).as("n"))
      assert(Bucketed.isShuffleFree(agg),
        agg.queryExecution.executedPlan.toString.take(2000))
      assert(agg.collect().map(_.getLong(1)).sum == 40L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS fact_bucketed_t")
    }
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
