package graft.functions

import graft.{Fns, SparkSpec}
import org.apache.spark.sql.functions._

/** Property-style tests for the sub-linear dedup paths against brute-force
  * ground truth on deterministic synthetic corpora (fixed seed). */
class DedupFunctionsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic corpus: 20 base docs of 60 tokens drawn from a vocab wide
  // enough that distinct docs share (almost) no shingles; docs 100.. are
  // near-copies of doc 0 with k token substitutions
  private def word(i: Int) = s"w${math.abs(i) % 4013}"
  private lazy val rng = {
    val docs = (0 until 20).map { d =>
      val toks = (0 until 60).map(p => word(d * 997 + p * 13 + (p * p) % 7))
      (d.toLong, toks.mkString(" "))
    }
    val base = docs.head._2.split(" ")
    val nearDups = Seq(1, 3, 10).zipWithIndex.map { case (k, j) =>
      val mutated = base.zipWithIndex.map { case (t, i) =>
        if (i < k) s"sub$i" else t
      }
      ((100 + j).toLong, mutated.mkString(" "))
    }
    docs ++ nearDups
  }
  private lazy val docs = rng.toDF("doc_id", "text")
    .withColumn("toks", Fns.tokens($"text"))

  /** Brute-force true Jaccard over distinct 3-shingles for a doc pair. */
  private def trueJaccard(id1: Long, id2: Long): Double = {
    val sh = docs
      .select($"doc_id", MinHash.shingles($"toks", 3).as("sh"))
      .filter($"doc_id".isin(id1, id2))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val (a, b) = (sh(id1), sh(id2))
    a.intersect(b).size.toDouble / a.union(b).size
  }

  test("signatureAgg is value-identical to the per-row HOF signature") {
    // the agg path exists purely for speed (codegen mins vs interpreted
    // HOF passes) — element i must still be min over shingles of
    // xxhash64(shingle, i), bit for bit
    val viaAgg = MinHash.signatureAgg(docs, "doc_id", $"toks", 3, 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaHof = docs.select($"doc_id",
        MinHash.signature(MinHash.shingles($"toks", 3), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaAgg.keySet == viaHof.keySet)
    viaAgg.foreach { case (id, sig) =>
      assert(sig == viaHof(id), s"signature mismatch for doc $id")
    }
  }

  test("identical docs: est Jaccard 1.0 and always a candidate pair") {
    val dup = docs.union(docs.filter($"doc_id" === 0)
      .withColumn("doc_id", lit(999L)))
    val found = MinHash.nearDuplicates(dup, "doc_id", col("toks"),
      threshold = 0.9)
      .filter($"id1" === 0 && $"id2" === 999)
      .collect()
    assert(found.length == 1)
    assert(found.head.getDouble(2) == 1.0)
  }

  test("MinHash estimate tracks true Jaccard within 0.2") {
    val signed = docs.select($"doc_id",
      MinHash.signature(MinHash.shingles($"toks", 3), 128).as("sig"))
    val s0 = signed.as("a").filter($"doc_id" === 0)
      .select($"sig".as("sig0"))
    val est = signed.crossJoin(s0)
      .filter($"doc_id".isin(100L, 101L, 102L))
      .select($"doc_id", MinHash.estJaccard($"sig", $"sig0").as("est"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, e) <- est) {
      val t = trueJaccard(0L, id)
      assert(math.abs(e - t) < 0.2, s"doc $id: est $e vs true $t")
    }
    // monotone: fewer substitutions -> higher similarity
    assert(est(100L) > est(102L))
  }

  test("near-dups of doc 0 are found; unrelated docs are not flagged") {
    val found = MinHash
      .nearDuplicates(docs, "doc_id", col("toks"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1- and 3-token mutants of doc 0 are >0.5-similar
    assert(found.contains((0L, 100L)))
    assert(found.contains((0L, 101L)))
    // distinct random docs don't collide above threshold
    assert(!found.exists { case (a, b) => a < 20 && b < 20 })
  }

  test("SimHash: identical fingerprints, small hamming for near-dups") {
    val fp = docs.select($"doc_id", SimHash.simhashExpr("toks").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) != fp(5L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // 1-token substitution moves few bits; unrelated docs move many
    assert(ham(fp(0L), fp(100L)) < ham(fp(0L), fp(5L)))
  }

  test("SimHash blocked near-dup join finds low-hamming pairs") {
    val pairs = SimHash.nearDuplicates(docs, "doc_id", "toks",
      maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 100L)))
  }

  test("LSH recall >= 0.9 vs brute-force truth at threshold 0.7 (sf0.1)") {
    // truth: UNCAPPED true Jaccard over distinct 3-shingles, all pairs
    // >= 0.7, on the real sf0.1 corpus (5000 docs, 256 such pairs)
    val corpus = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .withColumn("toks", Fns.tokens($"text"))
    val sh = corpus.filter(size($"toks") >= 3)
      .select($"doc_id", explode(MinHash.shingles($"toks", 3)).as("shingle"))
    val nsh = sh.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val truth = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
      .join(nsh.select($"doc_id".as("d1"), $"nsh".as("n1")), "d1")
      .join(nsh.select($"doc_id".as("d2"), $"nsh".as("n2")), "d2")
      .filter($"inter".cast("double") / ($"n1" + $"n2" - $"inter") >= 0.7)
      .select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture has no >=0.7 near-dup pairs")
    val found = MinHash
      .nearDuplicates(corpus, "doc_id", $"toks", threshold = 0.7)
      .select("id1", "id2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(found).size.toDouble / truth.size
    info(s"sf0.1 LSH recall@0.7 = $recall (${truth.size} true pairs, " +
      s"${found.size} reported)")
    assert(recall >= 0.9, s"LSH recall $recall < 0.9")
  }
}
