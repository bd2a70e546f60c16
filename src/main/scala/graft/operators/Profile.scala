package graft.operators

import graft.{GQuery, Tables}
import graft.profile.SchemaProfiler
import org.apache.spark.sql.functions._

/** Verified surface for the schema profiler (SURVEY.md §2.4 A4/A5/A6 + §2.9
  * R1 + §1.3 classification): profiles five `part` columns through the
  * library function and checks every metric, the role cascade, and the
  * logical-type lattice against an equivalent DuckDB query. */
object Profile {

  private val cols = Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size")

  private def colSql(c: String): String =
    s"""SELECT '$c' AS col_name,
       |  COUNT(*) AS n_rows,
       |  CAST(COUNT(*) - COUNT(sc) AS DOUBLE) / COUNT(*) AS null_ratio,
       |  CAST(COUNT(TRY_CAST(sc AS DOUBLE)) AS DOUBLE) / COUNT(sc) AS numeric_ratio,
       |  COUNT(DISTINCT sc) AS unique_count,
       |  CAST(SUM(len(sc)) AS DOUBLE) / COUNT(sc) AS mean_length,
       |  array_to_string(list_sort(list(DISTINCT sc))[1:3], '|') AS sample_values
       |FROM (SELECT CAST($c AS VARCHAR) AS sc FROM part)""".stripMargin

  private val classifySql =
    s"""CASE
       |  WHEN col_name IN ('id', 'record_id') THEN 'identifier'
       |  WHEN col_name IN ('source_file_name', 'source_file_path', 'load_timestamp') THEN 'audit'
       |  WHEN numeric_ratio > 0.8 THEN 'measure'
       |  WHEN unique_count < n_rows * 0.1 AND unique_count < 50 THEN 'dimension'
       |  WHEN unique_count = n_rows THEN 'potential_key'
       |  ELSE 'attribute' END AS classification,
       |CASE
       |  WHEN numeric_ratio > 0.95 THEN 'numeric'
       |  WHEN numeric_ratio > 0.5 THEN 'mixed_numeric'
       |  WHEN mean_length > 100 THEN 'text'
       |  ELSE 'string' END AS data_type""".stripMargin

  val queries: Seq[(String, GQuery)] = Seq(
    "q_profile" -> GQuery(
      (s, d) =>
        SchemaProfiler.profile(Tables.load(s, d, "part"), cols)
          .orderBy(col("col_name")),
      Some(s"""SELECT col_name, n_rows, null_ratio, numeric_ratio, unique_count,
        |  mean_length, sample_values,
        |$classifySql
        |FROM (
        |${cols.map(colSql).mkString("", "\nUNION ALL\n", "")}
        |) ORDER BY col_name""".stripMargin),
      "column profiling + role classification (R/schema_analyzer.R:4-55)"),
  )
}
