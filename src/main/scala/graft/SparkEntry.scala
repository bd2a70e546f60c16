package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the per-module registries so each operator
  * family (relational core, profiler, star transform, extensions) owns its
  * own named, documented, oracle-backed entries.
  */
object SparkEntry {

  /** All registered operators, in registration order. Later modules must not
    * reuse a name — enforced by the uniqueness require below. */
  def all: Seq[(String, GQuery)] =
    operators.Relational.queries ++
      operators.Analytics.queries ++
      operators.Text.queries ++
      operators.Dedup.queries ++
      operators.Contamination.queries ++
      operators.SqlShapes.queries ++
      operators.Corpus.queries ++
      operators.TimeWindows.queries ++
      operators.Similarity.queries ++
      operators.Profile.queries ++
      operators.StarQueries.queries ++
      operators.AsOf.queries ++
      operators.Behavior.queries ++
      operators.Bpe.queries ++
      operators.Graph.queries ++
      operators.MlFit.queries ++
      operators.Inference.queries

  require(all.map(_._1).distinct.size == all.size, "duplicate query names")

  private lazy val byName: Map[String, GQuery] = all.toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    byName("q_agg_basic").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q) => n -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (n, q) if q.oracle.isDefined => n -> q.oracle.get }.toMap
}
