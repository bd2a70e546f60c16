package graft.operators

import graft.{GQuery, Tables}
import graft.star.StarTransformer
import org.apache.spark.sql.functions._

/** Oracle-verified surface for the star transformer's read-back aggregation
  * (`aggregate_fact_data`, `R/star_transformer.R:148-165`): the ACTUAL
  * library function run over lineitem, checked against the equivalent SQL.
  * (Plain double aggregates here — DuckDB and Spark sum doubles in
  * nondeterministic order, so the measure column is pre-rounded to 2dp
  * money values whose sums stay exact in double up to ~2^45.) */
object StarQueries {

  val queries: Seq[(String, GQuery)] = Seq(
    "q_agg_star" -> GQuery(
      (s, d) => {
        val fact = Tables.load(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"),
            col("l_quantity").as("qty"))
        StarTransformer.aggregateFactData(
          fact, Seq("l_returnflag", "l_linestatus"), Seq("qty"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
        |  SUM(qty) AS qty_sum, AVG(qty) AS qty_avg,
        |  MIN(qty) AS qty_min, MAX(qty) AS qty_max,
        |  COUNT(qty) AS qty_count
        |FROM (SELECT l_returnflag, l_linestatus, l_quantity AS qty FROM lineitem)
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      "aggregate_fact_data suffixed multi-agg (R/star_transformer.R:148-165)"),
  )
}
