package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joining two tables bucketed on the key plans no shuffle exchange") {
    val left = (1L to 5000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 5000L).map(i => (i, i * 2.0)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bkt_left", "k", 4)
    Bucketing.writeBucketed(right, "bkt_right", "k", 4)
    val joined = spark.table("bkt_left")
      .join(spark.table("bkt_right").hint("merge"), Seq("k"))
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      assert(Bucketing.isShuffleFree(joined),
        joined.queryExecution.executedPlan.toString.take(2000))
      assert(joined.count() == 5000)
    }
    // contrast: the same join over unbucketed data DOES shuffle
    val plainJoin = left.join(right.hint("merge"), Seq("k"))
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      assert(!Bucketing.isShuffleFree(plainJoin))
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
