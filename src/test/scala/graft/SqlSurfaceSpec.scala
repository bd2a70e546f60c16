package graft

import org.apache.spark.sql.functions._

/** The spark.sql front-end over registered views must agree with the
  * DataFrame API — same tables, same Catalyst plans. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("registerTables exposes every testdata table to spark.sql") {
    val names = Sql.registerTables(spark, dir)
    assert(names == Sql.TableNames) // all present at sf0.001
    assert(spark.sql("SELECT count(*) FROM lineitem").as[Long].head() ==
      spark.read.parquet(s"$dir/lineitem.parquet").count())
  }

  test("SQL and DataFrame front-ends return identical grouped results") {
    Sql.registerTables(spark, dir)
    val viaSql = Sql.query(spark,
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    val viaDf = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), Fns.dsum2($"l_quantity").as("sum_qty"))
    assert(viaSql.except(viaDf).isEmpty && viaDf.except(viaSql).isEmpty)
  }

  test("events view carries the converted micros timestamp type") {
    Sql.registerTables(spark, dir)
    // nanosAsLong reads ts as long; Tables.load must have converted it
    assert(spark.sql("SELECT ts FROM events").schema("ts")
      .dataType.typeName == "timestamp")
  }
}
