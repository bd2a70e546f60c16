package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph centrality (SURVEY.md §2.11 extension tier): PageRank over
  * an edge table — the quality signal web-scale corpus pipelines attach
  * to documents (CommonCrawl-style centrality filtering) and the third
  * member of graft's iterative-operator family beside [[Dedup.clusters]]
  * and [[Bpe.train]].
  *
  * Per iteration: contributions = one keyed join of edges against the
  * current rank table (co-partitioned on src) + a partial-aggregated
  * shuffle of (dst, contribution) — O(edges) map work, O(nodes) shuffled
  * bytes; the new rank table is `localCheckpoint`ed so iterative lineage
  * never compounds. Driver state: nothing but the loop counter. This is
  * the simple (non-dangling-redistributing) variant: rank mass leaving
  * sink nodes is dropped, as documented.
  */
object Graph {

  /** PageRank over directed `edges` (columns `src`, `dst`); returns
    * (id, rank). Fixed iteration count — callers pick it; ~10 is the
    * usual centrality-signal setting. */
  def pageRank(
      edges: DataFrame,
      iterations: Int = 10,
      damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    val n = nodes.count().toDouble
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst").as("id"),
          (col("rank") / col("out_deg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("in_mass"))
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  val queries: Seq[(String, GQuery)] = Seq(
    // Centrality over the customer->supplier trade graph (orders x
    // lineitem): 10 PageRank rounds, top-20 by rank. Iterative double
    // arithmetic is not stably oracle-comparable across engines
    // (aggregation-order drift compounds per round), so the driver
    // records a rows-only check; semantics are golden-tested against an
    // independent in-memory implementation in GraphSpec.
    "q_pagerank" -> GQuery(
      (s, d) => {
        import s.implicits._
        val edges = Tables.load(s, d, "orders")
          .select($"o_orderkey", $"o_custkey")
          .join(Tables.load(s, d, "lineitem")
            .select($"l_orderkey".as("o_orderkey"), $"l_suppkey"),
            "o_orderkey")
          .select(concat(lit("c"), $"o_custkey").as("src"),
            concat(lit("s"), $"l_suppkey").as("dst"))
          .distinct()
        pageRank(edges, iterations = 10)
          .orderBy($"rank".desc, $"id")
          .limit(20)
      },
      None,
      "PageRank centrality over the customer->supplier graph (10 rounds)"),
  )
}
