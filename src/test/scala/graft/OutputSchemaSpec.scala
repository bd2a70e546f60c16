package graft

import org.apache.spark.sql.types.{DataType, DecimalType, StructType}

/** Output-schema contract over EVERY registered query: no column the
  * driver hashes may be decimal-typed. The driver's byte-hash diverges
  * on decimal outputs (Spark parquet decimal vs DuckDB's own decimal
  * conversion path) even when every value is identical — the only 2
  * red rows of round 11 (`q_mannwhitney`, `q_kendall_tau`) were
  * exactly the only 2 of 290 queries with a decimal output column.
  * Decimal INTERNALS are fine and encouraged for overflow safety; the
  * final select must cast to BIGINT/DOUBLE. `tools/compare.py` carries
  * the same gate on the DuckDB side; this spec catches it at build
  * time without a driver round-trip. (VERDICT r11 "Next round" #2b)
  */
class OutputSchemaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def decimalLeaves(dt: DataType, path: String): Seq[String] =
    dt match {
      case _: DecimalType => Seq(path)
      case s: StructType =>
        s.fields.flatMap(f => decimalLeaves(f.dataType, s"$path.${f.name}"))
      case a: org.apache.spark.sql.types.ArrayType =>
        decimalLeaves(a.elementType, s"$path[]")
      case m: org.apache.spark.sql.types.MapType =>
        decimalLeaves(m.keyType, s"$path.key") ++
          decimalLeaves(m.valueType, s"$path.value")
      case _ => Nil
    }

  test("no registered query has a decimal-typed output column") {
    // .schema forces analysis only — no execution, so the full
    // registry stays cheap even at 290 queries
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val bad = q(spark, dir).schema.fields
          .flatMap(f => decimalLeaves(f.dataType, f.name))
        if (bad.isEmpty) Nil else Seq(s"$name: ${bad.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      "decimal-typed output columns (driver hash hazard — cast the " +
        "final select to BIGINT/DOUBLE in BOTH engines):\n" +
        offenders.mkString("\n"))
  }

  test("the detector itself trips on a deliberately-decimal output") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(1L, 2L).toDF("v")
      .agg(sum($"v".cast(DecimalType(19, 0))).as("s"), // top-level
        struct(lit(1).cast(DecimalType(5, 2)).as("d")).as("nested"),
        array(lit(1).cast(DecimalType(5, 0))).as("arr"))
    val bad = df.schema.fields.flatMap(f => decimalLeaves(f.dataType, f.name))
    assert(bad.toSeq == Seq("s", "nested.d", "arr[]"),
      s"detector missed a decimal shape: $bad")
  }
}
