package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Independent-implementation goldens for the MlFit queries: each query's
  * distributed result is recomputed by a straight-line single-machine
  * reimplementation over the collected corpus (the BpeSpec pattern) and
  * compared exactly — pinning the semantics against a SECOND independent
  * path beside the DuckDB oracle hash the driver checks. */
class MlFitSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  test("q_kmeans matches a local 2-round Lloyd reimplementation") {
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .select($"vec_id", expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
        .as("vi"))
      .as[(Long, Array[Long])].collect().sortBy(_._1)
    val k = 8
    def sqDistL(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var j = 0
      while (j < a.length) { val t = a(j) - b(j); s += t * t; j += 1 }
      s
    }
    def sqDistD(a: Array[Long], b: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) { val t = a(j) - b(j); s += t * t; j += 1 }
      s
    }
    // round 1: exact integer distances to the first-k seed vectors
    val cent0 = vecs.take(k).map(_._2)
    val a1 = vecs.map { case (id, v) =>
      id -> (0 until k).minBy(c => (sqDistL(v, cent0(c)), c))
    }.toMap
    // round-1 centroids: exact rational means
    val byC1 = vecs.groupBy { case (id, _) => a1(id) }
    val cent1 = (0 until k).map { c =>
      val m = byC1(c).map(_._2)
      Array.tabulate(64)(j => m.map(_(j)).sum.toDouble / m.length)
    }
    // round 2: double distances against the rational centroids
    val a2 = vecs.map { case (id, v) =>
      id -> (0 until k).minBy(c => (sqDistD(v, cent1(c)), c))
    }.toMap
    val byC2 = vecs.groupBy { case (id, _) => a2(id) }
    val expected = (0 until k).map { c =>
      val m = byC2(c).map(_._2)
      (c, m.length.toLong, (1 to 4).map(j =>
        BigDecimal(m.map(_(j - 1)).sum.toDouble / m.length / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }

    val got = SparkEntry.queries("q_kmeans")(spark, d)
      .as[(Int, Long, Double, Double, Double, Double)].collect().toSeq
      .map(r => (r._1, r._2, Seq(r._3, r._4, r._5, r._6)))
    assert(got.map(g => (g._1, g._2)) === expected.map(e => (e._1, e._2)))
    got.zip(expected).foreach { case (g, e) =>
      g._3.zip(e._3).foreach { case (gv, ev) =>
        assert(math.abs(gv - ev) <= 1e-6, s"cluster ${g._1}: $gv vs $ev")
      }
    }
  }

  test("q_naive_bayes matches a local NB reimplementation exactly") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)]
      .collect()
    val toks = docs.map { case (id, lang, text) =>
      (id, lang, text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty))
    }.filter(_._3.nonEmpty)
    val langs = toks.map(_._2).distinct.sorted
    val nDocs = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nTotal = toks.length.toLong
    val cnt = toks.flatMap(t => t._3.map(w => (t._2, w)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tot = toks.groupBy(_._2).view
      .mapValues(_.map(_._3.length.toLong).sum).toMap
    val v = toks.flatMap(_._3).distinct.length.toLong
    // argmax with the query's tie-break (score desc, then lang asc)
    val pred = toks.map { case (_, actual, ws) =>
      val scoresByLang = langs.map { l =>
        val ll = ws.map(w => math.log(
          (cnt.getOrElse((l, w), 0L) + 1).toDouble / (tot(l) + v))).sum
        (l, ll + math.log(nDocs(l).toDouble / nTotal))
      }
      (actual, scoresByLang.sortBy { case (l, sc) => (-sc, l) }.head._1)
    }
    val expected = pred.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val got = SparkEntry.queries("q_naive_bayes")(spark, d)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === expected, s"got $got\nexpected $expected")
  }
}
