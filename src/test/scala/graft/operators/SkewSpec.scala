package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns the same rows as a plain join") {
    // hot key: 900 of 1000 rows share key 1
    val large = (1 to 1000).map(i => (if (i <= 900) 1 else i, s"v$i"))
      .toDF("k", "payload")
    val small = Seq((1, "one"), (50, "fifty"), (999, "nines"))
      .toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(large, small, "k", saltBuckets = 8)
      .select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 901) // 900 hot-key rows + key 999 (key 50 is absent)
  }

  test("salt spreads a hot key across buckets") {
    val large = (1 to 1000).map(i => (1, s"v$i")).toDF("k", "payload")
    val buckets = large
      .withColumn("s", Skew.salt(8, Seq($"payload")))
      .groupBy("s").count().collect()
    assert(buckets.length == 8) // all 8 buckets hit
    assert(buckets.map(_.getLong(1)).max < 400) // no bucket holds most rows
  }
}
