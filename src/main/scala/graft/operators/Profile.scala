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

    // Key-candidate + functional-dependency audit — the data-quality
    // pass that decides whether a column can serve as a join key and
    // whether an assumed dependency (does X determine Y?) actually holds
    // before a pipeline builds dims on it. Each audit row is one grouped
    // aggregate: key checks count duplicate key values; FD checks count
    // left-hand values mapping to >1 right-hand value. All counts are
    // exact integers; `ok` is the boolean a CI gate would assert on.
    // Scale shape: every audit is a partial-agg shuffle on its own key —
    // the five audits run as independent branches of one union (Spark
    // schedules them concurrently), nothing global or single-partition.
    "q_fd_profile" -> GQuery(
      (s, d) => {
        val orders = Tables.load(s, d, "orders")
        val lineitem = Tables.load(s, d, "lineitem")
        // each audit is an independent partial-aggregated scalar
        // reduction over its own table scan; checkpoint every 1-row
        // audit RESULT (the ee746d2 anchor pattern) so the plan is a
        // union of five precomputed rows instead of five stacked
        // single-partition barriers (r13 audit: singlepart x5). The five
        // materialization jobs are independent, so they run CONCURRENTLY
        // (Fns.parMat, guide §2.6) — r15: the sequential chain was ~5x
        // one audit's latency for byte-identical results.
        def keyAudit(df: org.apache.spark.sql.DataFrame, name: String,
            keyCols: Seq[String]) =
          df.agg(count(lit(1)).as("n_rows"),
              countDistinct(keyCols.head, keyCols.tail: _*).as("n_groups"))
            .select(lit(name).as("audit"), col("n_rows"), col("n_groups"),
              (col("n_rows") - col("n_groups")).as("n_violations"),
              (col("n_rows") === col("n_groups")).as("ok"))
        def fdAudit(df: org.apache.spark.sql.DataFrame, name: String,
            lhs: String, rhs: String) =
          df.groupBy(col(lhs))
            .agg(countDistinct(col(rhs)).as("k"))
            .agg(sum(lit(1)).as("n_rows"), count(lit(1)).as("n_groups"),
              sum(when(col("k") > 1, 1L).otherwise(0L)).as("n_violations"))
            .select(lit(name).as("audit"),
              col("n_groups").as("n_rows"), col("n_groups"),
              col("n_violations"), (col("n_violations") === 0).as("ok"))
        graft.Fns.parMat(Seq(
            keyAudit(orders, "key:o_orderkey", Seq("o_orderkey")),
            keyAudit(orders, "key:o_custkey", Seq("o_custkey")),
            keyAudit(lineitem, "key:l_orderkey+l_linenumber",
              Seq("l_orderkey", "l_linenumber")),
            fdAudit(orders, "fd:o_custkey->o_orderpriority",
              "o_custkey", "o_orderpriority"),
            fdAudit(lineitem, "fd:l_orderkey->l_linestatus",
              "l_orderkey", "l_linestatus")))
          .reduce(_ unionAll _)
          .orderBy(col("audit"))
      },
      Some("""WITH k1 AS (
        |  SELECT 'key:o_orderkey' AS audit,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_groups
        |  FROM orders),
        |k2 AS (
        |  SELECT 'key:o_custkey' AS audit,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_groups
        |  FROM orders),
        |k3 AS (
        |  SELECT 'key:l_orderkey+l_linenumber' AS audit,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
        |      AS n_groups
        |  FROM lineitem),
        |f1 AS (
        |  SELECT 'fd:o_custkey->o_orderpriority' AS audit,
        |    CAST(COUNT(*) AS BIGINT) AS n_groups,
        |    CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violations
        |  FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS k
        |        FROM orders GROUP BY 1)),
        |f2 AS (
        |  SELECT 'fd:l_orderkey->l_linestatus' AS audit,
        |    CAST(COUNT(*) AS BIGINT) AS n_groups,
        |    CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violations
        |  FROM (SELECT l_orderkey, COUNT(DISTINCT l_linestatus) AS k
        |        FROM lineitem GROUP BY 1))
        |SELECT audit, n_rows, n_groups,
        |  n_rows - n_groups AS n_violations,
        |  n_rows = n_groups AS ok FROM k1
        |UNION ALL SELECT audit, n_rows, n_groups,
        |  n_rows - n_groups, n_rows = n_groups FROM k2
        |UNION ALL SELECT audit, n_rows, n_groups,
        |  n_rows - n_groups, n_rows = n_groups FROM k3
        |UNION ALL SELECT audit, n_groups AS n_rows, n_groups,
        |  n_violations, n_violations = 0 FROM f1
        |UNION ALL SELECT audit, n_groups AS n_rows, n_groups,
        |  n_violations, n_violations = 0 FROM f2
        |ORDER BY audit""".stripMargin),
      "key-candidate + functional-dependency data-quality audit"),

    // Declarative data-quality CONTRACT over orders via
    // [[graft.profile.Expectations]] — the deequ/Great-Expectations
    // shape as one aggregate pass (every check compiles to metric
    // columns of a single agg; map-side partials, one scan however many
    // checks). The report itself is the query output, so the whole API
    // — metric math, null semantics, verdicts — is oracle-gated: DuckDB
    // recomputes every metric independently. Contract chosen to exercise
    // both verdicts (one deliberately failing range check).
    "q_expectations" -> GQuery(
      (s, d) => {
        import s.implicits._
        import graft.profile.Expectations._
        val report = check(Tables.load(s, d, "orders"), Seq(
          NotNull("o_orderkey"),
          Unique(Seq("o_orderkey")),
          InRange("o_totalprice", 0.0, 1e9),
          InRange("o_totalprice", 0.0, 1000.0),
          InSet("o_orderstatus", Seq("O", "F", "P")),
          MatchesRegex("o_orderpriority", "^[1-5]-[A-Z ]+$")))
        report.select($"expectation", round($"metric", 6).as("metric"),
            $"threshold", $"passed")
          .orderBy($"expectation")
      },
      Some("""WITH st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    AVG(CASE WHEN o_orderkey IS NULL THEN 1.0 ELSE 0.0 END)
        |      AS null_frac,
        |    CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) AS nd,
        |    CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS nn,
        |    AVG(CASE WHEN o_totalprice IS NULL THEN NULL
        |      WHEN o_totalprice BETWEEN 0.0 AND 1e9 THEN 1.0
        |      ELSE 0.0 END) AS r1,
        |    AVG(CASE WHEN o_totalprice IS NULL THEN NULL
        |      WHEN o_totalprice BETWEEN 0.0 AND 1000.0 THEN 1.0
        |      ELSE 0.0 END) AS r2,
        |    AVG(CASE WHEN o_orderstatus IS NULL THEN NULL
        |      WHEN o_orderstatus IN ('O', 'F', 'P') THEN 1.0
        |      ELSE 0.0 END) AS s1,
        |    AVG(CASE WHEN o_orderpriority IS NULL THEN NULL
        |      WHEN regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
        |      THEN 1.0 ELSE 0.0 END) AS m1
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT 'not_null(o_orderkey)' AS expectation,
        |    round(null_frac, 6) AS metric, CAST(0.0 AS DOUBLE) AS threshold,
        |    null_frac <= 0.0 AS passed FROM st
        |  UNION ALL SELECT 'unique(o_orderkey)',
        |    round(CASE WHEN nn = 0 THEN 0.0 ELSE 1.0 - nd / nn END, 6),
        |    CAST(0.0 AS DOUBLE),
        |    (CASE WHEN nn = 0 THEN 0.0 ELSE 1.0 - nd / nn END) = 0.0
        |  FROM st
        |  UNION ALL SELECT 'in_range(o_totalprice,0.0,1.0E9)',
        |    round(r1, 6), CAST(1.0 AS DOUBLE), r1 >= 1.0 FROM st
        |  UNION ALL SELECT 'in_range(o_totalprice,0.0,1000.0)',
        |    round(r2, 6), CAST(1.0 AS DOUBLE), r2 >= 1.0 FROM st
        |  UNION ALL SELECT 'in_set(o_orderstatus,{O|F|P})',
        |    round(s1, 6), CAST(1.0 AS DOUBLE), s1 >= 1.0 FROM st
        |  UNION ALL SELECT 'matches_regex(o_orderpriority,^[1-5]-[A-Z ]+$)',
        |    round(m1, 6), CAST(1.0 AS DOUBLE), m1 >= 1.0 FROM st)
        |ORDER BY expectation""".stripMargin),
      "one-pass declarative data-quality contract report (deequ shape)"),
  )
}
