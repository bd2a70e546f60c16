package graft.io

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val src = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")
    .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag",
      $"l_shipdate")

  test("every format round-trips rows and types exactly") {
    val expected = src.orderBy($"l_orderkey", $"l_linenumber")
      .collect().map(_.toSeq).toSeq
    Formats.all.foreach { f =>
      val dir = Files.createTempDirectory(s"graft_fmt_${f.name}").toString
      Formats.write(src, dir, f)
      val back = Formats.read(spark, dir, f, Some(src.schema))
      assert(back.schema == src.schema, s"${f.name}: schema drifted")
      val got = back.orderBy($"l_orderkey", $"l_linenumber")
        .collect().map(_.toSeq).toSeq
      assert(got == expected, s"${f.name}: rows drifted")
    }
  }

  test("columnar formats push filters and prune columns at the scan") {
    Formats.all.filter(Formats.columnar).foreach { f =>
      val dir = Files.createTempDirectory(s"graft_push_${f.name}").toString
      Formats.write(src, dir, f)
      val plan = Formats.read(spark, dir, f)
        .filter($"l_quantity" < 5.0)
        .select($"l_orderkey", $"l_quantity")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5.0)]"),
        s"${f.name}: filter not pushed\n${plan.take(800)}")
      assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
        s"${f.name}: columns not pruned\n${plan.take(800)}")
    }
  }

  test("text formats refuse schema-less read-back") {
    val dir = Files.createTempDirectory("graft_noschema").toString
    Formats.write(src, dir, Formats.Json)
    intercept[IllegalArgumentException] {
      Formats.read(spark, dir, Formats.Json)
    }
  }
}
