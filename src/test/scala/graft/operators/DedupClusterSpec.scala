package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected-component clustering over near-dup pairs: transitive chains
  * collapse to one canonical keeper. */
class DedupClusterSpec extends SparkSpec {
  import spark.implicits._

  test("chains collapse transitively; separate clusters stay apart") {
    // 1-2-3-4 is one chain (1~4 never paired directly); 10-11 separate
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id1", "id2")
    val got = Dedup.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("deep chain converges within the round bound (log diameter)") {
    // path graph 0-1-2-...-63: worst-case diameter for min propagation
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("id1", "id2")
    val got = Dedup.clusters(pairs)
    assert(got.filter($"cluster_id" === 0L).count() == 64)
  }

  test("memoized cluster index: every consumer sees identical cluster ids") {
    val d = "/root/testdata/sf0.001"
    val q = graft.SparkEntry.queries
    val fromClusters = q("q_dup_clusters")(spark, d)
      .select($"doc_id", $"cluster_id")
      .as[(Long, Long)].collect().toMap
    val fromSplit = q("q_split_safe")(spark, d)
      .select($"doc_id", $"cluster_id")
      .as[(Long, Long)].collect().toMap
    val fromKeeper = q("q_dedup_keep_best")(spark, d)
      .select($"cluster_id").as[Long].collect().toSet
    // split covers ALL docs; on the clustered subset ids must agree
    fromClusters.foreach { case (doc, cl) =>
      assert(fromSplit(doc) == cl, s"doc $doc: $cl vs ${fromSplit(doc)}")
    }
    // the keeper query's clusters are exactly the clustered subset's ids
    assert(fromKeeper == fromClusters.values.toSet)
  }

  test("memoized indexes are keyed per session: a second SparkSession " +
      "rebuilds and agrees instead of inheriting another session's plan") {
    val d = "/root/testdata/sf0.001"
    val first = graft.SparkEntry.queries("q_dup_clusters")(spark, d)
      .collect().map(_.toSeq).toSet
    // newSession shares the SparkContext but is a DIFFERENT session —
    // the (session, dir) cache key must miss, rebuild cleanly, and
    // produce the identical cluster map (ADVICE r5: a dir-only key
    // served one session's checkpointed DataFrame to another)
    val s2 = spark.newSession()
    val second = graft.SparkEntry.queries("q_dup_clusters")(s2, d)
      .collect().map(_.toSeq).toSet
    assert(second == first)
  }

  test("deduplicate keeps one canonical doc per near-dup cluster") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
    val kept = Dedup.deduplicate(docs, "doc_id", "text").cache()
    val n0 = docs.count()
    val n1 = kept.count()
    assert(n1 < n0, s"nothing removed from $n0 docs")
    assert(kept.columns.sameElements(docs.columns)) // schema preserved
    // no two survivors are still LSH near-dups at the threshold
    val residualPairs = graft.functions.MinHash.nearDuplicates(
      kept.withColumn("toks", graft.Fns.tokens($"text")),
      "doc_id", $"toks", threshold = 0.7)
    assert(residualPairs.isEmpty)
    // each removed doc had a surviving representative with smaller id
    val removed = docs.select("doc_id").except(kept.select("doc_id"))
    assert(removed.count() == n0 - n1)
    kept.unpersist()
  }

  test("clusters over real LSH pairs pick one keeper per duplicate group") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .withColumn("toks", graft.Fns.tokens($"text"))
    val pairs = graft.functions.MinHash
      .nearDuplicates(docs, "doc_id", $"toks", threshold = 0.7)
    val cl = Dedup.clusters(pairs)
    // every cluster id is the minimum doc_id of its members
    val bad = cl.groupBy($"cluster_id")
      .agg(min($"id").as("lo"))
      .filter($"cluster_id" =!= $"lo").count()
    assert(bad == 0)
    // and members of a cluster really are pairwise-connected through pairs:
    // spot-check that every pair's two sides share a cluster
    val sides = pairs.select($"id1", $"id2")
      .join(cl.select($"id".as("id1"), $"cluster_id".as("c1")), "id1")
      .join(cl.select($"id".as("id2"), $"cluster_id".as("c2")), "id2")
    assert(sides.filter($"c1" =!= $"c2").count() == 0)
  }
}
