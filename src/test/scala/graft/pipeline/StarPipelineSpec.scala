package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StarPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2024-06-07 08:09:10")

  test("JSON source: nested objects collapse, star schema builds") {
    val in = Files.createTempDirectory("graft_json_in")
    val out = Files.createTempDirectory("graft_json_out")
    val lines = (1 to 60).map { i =>
      val cat = s"c${i % 3}"
      s"""{"id":"$i","category":"$cat","amount":"${i * 2.5}","detail":{"qty":"${i % 7}","total":"${i * 5.0}"},"tags":["a","b"]}"""
    }
    Files.writeString(in.resolve("data.json"), lines.mkString("\n"))
    val raw = StarPipeline.readJson(spark, in.toString)
    val res = StarPipeline.fromDataFrame(spark, raw, out.toString, 9L, ts)
    assert(res.rows == 60)
    assert(res.violations.isEmpty)
    val fact = spark.read.parquet(s"$out/fact_main.parquet")
    // nested detail collapsed then classified; category became a dim
    assert(fact.columns.contains("category_key"))
    assert(fact.schema("amount").dataType.typeName == "double")
    val dim = spark.read.parquet(s"$out/dim_category.parquet")
    assert(dim.count() == 3)
  }

  test("CSV source runs through the same stages") {
    val in = Files.createTempDirectory("graft_csv_in")
    val out = Files.createTempDirectory("graft_csv_out")
    val rows = "id,grade,score" +:
      (1 to 50).map(i => s"$i,g${i % 4},${i * 1.5}")
    Files.writeString(in.resolve("data.csv"), rows.mkString("\n"))
    val res = StarPipeline.fromDataFrame(spark,
      StarPipeline.readCsv(spark, in.toString), out.toString, 3L, ts)
    assert(res.rows == 50)
    assert(res.violations.isEmpty)
    val fact = spark.read.parquet(s"$out/fact_main.parquet")
    assert(fact.columns.contains("grade_key")) // 4 uniques < 10% of 50
    assert(fact.schema("score").dataType.typeName == "double")
  }
}
