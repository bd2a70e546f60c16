package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-first entry point: registers the testdata tables as temp views so
  * every operator is reachable through `spark.sql(...)` as well as the
  * DataFrame API — both front-ends produce the same Catalyst plans, so
  * pushdown/broadcast/partial-agg behavior is identical either way. */
object Sql {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Registers each table under its bare name (skips files absent from
    * `dir`). Returns the registered names. */
  def registerTables(spark: SparkSession, dir: String): Seq[String] =
    TableNames.filter { n =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$n.parquet")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val exists = fs.exists(p)
      if (exists) Tables.load(spark, dir, n).createOrReplaceTempView(n)
      exists
    }

  /** Runs a SQL query against the registered views. */
  def query(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)
}
