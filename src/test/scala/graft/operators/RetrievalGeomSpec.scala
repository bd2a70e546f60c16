package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Golden recounts for the round-12 retrieval/geometry/readability
  * additions (q_err, q_silhouette, q_flesch, q_elasticity). Each test
  * recomputes the statistic INDEPENDENTLY in plain Scala from the raw
  * sf0.001 rows — brute-force cosine loops in the same left-to-right
  * accumulation order as the codegen expression (bit-identical
  * doubles), textbook cascade/silhouette/OLS definitions. */
class RetrievalGeomSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  private lazy val vecs: Seq[(Long, Array[Float], Long)] =
    graft.Tables.load(spark, d, "embeddings")
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Long)].collect().toSeq.sortBy(_._1)

  /** Same accumulation order as CosineSimilarityExpr — bit-identical. */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("q_err matches a brute-force cascade-model recount") {
    val probes = vecs.filter(_._1 < 8)
    val corpus = vecs.filter(_._1 >= 8)
    val expect = probes.map { case (qid, qemb, qlab) =>
      val top = corpus
        .map { case (vid, emb, lab) => (vid, lab, cos(emb, qemb)) }
        .sortBy { case (vid, _, c) => (-c, vid) }.take(10)
      var k = 0; var err = 0L; var nRel = 0L
      top.zipWithIndex.foreach { case ((_, lab, _), idx) =>
        if (lab == qlab) {
          err += math.round(1e6 / ((idx + 1).toLong * (1L << (k + 1))))
          k += 1; nRel += 1
        }
      }
      (qid, nRel, err)
    }
    val got = q("q_err").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == expect)
  }

  test("q_silhouette matches a textbook pairwise recount") {
    val panel = vecs.filter(_._1 < 256)
    val sByLabel = panel.flatMap { case (i, ei, li) =>
      val others = panel.filter(_._1 != i)
      val d6 = others.map { case (j, ej, lj) =>
        (lj, math.round((1.0 - cos(ei, ej)) * 1e6)) }
      val own = d6.filter(_._1 == li).map(_._2)
      if (own.isEmpty) None
      else {
        val a = own.sum.toDouble / own.length
        val b = d6.filter(_._1 != li).groupBy(_._1)
          .map { case (_, v) => v.map(_._2).sum.toDouble / v.length }.min
        Some(li -> math.round((b - a) / math.max(a, b) * 1e6))
      }
    }.groupBy(_._1)
    val expect = sByLabel.map { case (lab, v) =>
      (lab, v.length.toLong,
        math.round(v.map(_._2).sum.toDouble / v.length))
    }.toSeq.sortBy(_._1)
    val got = q("q_silhouette")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2)
      assert(math.abs(g._3 - e._3) <= 2, s"label ${g._1}: ${g._3} vs ${e._3}")
    }
  }

  test("q_flesch matches a per-doc regex recount") {
    val docs = graft.Tables.load(spark, d, "documents")
      .select($"source", $"text").as[(String, String)].collect()
    val expect = docs.flatMap { case (src, text) =>
      val w = text.trim.toLowerCase.split("\\s+").count(_.nonEmpty)
      val st = math.max("[.!?]+".r.findAllIn(text).length, 1)
      val syl = "[aeiouy]+".r.findAllIn(text.toLowerCase).length
      if (w == 0) None
      else Some(src -> math.round(
        (206.835 - 1.015 * w.toDouble / st - 84.6 * syl.toDouble / w)
          * 1e6))
    }.groupBy(_._1).map { case (src, v) =>
      (src, v.length.toLong,
        math.round(v.map(_._2).sum.toDouble / v.length))
    }.toSeq.sortBy(_._1)
    val got = q("q_flesch")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2)
      assert(math.abs(g._3 - e._3) <= 2, s"${g._1}: ${g._3} vs ${e._3}")
    }
  }

  test("q_elasticity matches frozen-path BigInt moments and an " +
    "unfrozen OLS sanity check") {
    val qty = graft.Tables.load(spark, d, "lineitem")
      .select($"l_partkey",
        org.apache.spark.sql.functions
          .expr("CAST(round(l_quantity * 100, 0) AS BIGINT)"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val parts = graft.Tables.load(spark, d, "part")
      .select($"p_partkey", $"p_brand", $"p_retailprice")
      .as[(Long, String, Double)].collect()
    val pts = parts.flatMap { case (pk, brand, price) =>
      qty.get(pk).map { q100 =>
        (brand, math.round(math.log(price) * 1e6),
          math.round(math.log(q100 / 100.0) * 1e6))
      }
    }
    val expect = pts.groupBy(_._1).map { case (brand, v) =>
      val n = v.length.toLong
      val su = v.map(r => BigInt(r._2)).sum
      val sv = v.map(r => BigInt(r._3)).sum
      val suv = v.map(r => BigInt(r._2) * BigInt(r._3)).sum
      val suu = v.map(r => BigInt(r._2) * BigInt(r._2)).sum
      val svv = v.map(r => BigInt(r._3) * BigInt(r._3)).sum
      val num = n.toDouble * suv.toDouble - su.toDouble * sv.toDouble
      val du = n.toDouble * suu.toDouble - su.toDouble * su.toDouble
      val dv = n.toDouble * svv.toDouble - sv.toDouble * sv.toDouble
      val beta = num / du
      val alpha = (sv.toDouble - beta * su.toDouble) / n
      val r2 = num * num / (du * dv)
      (brand, n, math.round(beta * 1e6), math.round(alpha),
        math.round(r2 * 1e6))
    }.toSeq.sortBy(_._1)
    val got = q("q_elasticity")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2, s"panel ${g._1}")
      assert(math.abs(g._3 - e._3) <= 2, s"beta ${g._1}: ${g._3} vs ${e._3}")
      assert(math.abs(g._4 - e._4) <= 2, s"alpha ${g._1}")
      assert(math.abs(g._5 - e._5) <= 2, s"r2 ${g._1}")
      assert(g._5 >= 0 && g._5 <= 1000000L)
    }
    // unfrozen-path sanity: the micro-freeze must not move beta by more
    // than the freeze granularity allows
    val unfrozen = pts.groupBy(_._1).map { case (brand, v) =>
      val xs = v.map(_._2.toDouble / 1e6); val ys = v.map(_._3.toDouble / 1e6)
      val n = v.length
      val beta = (n * xs.zip(ys).map(p => p._1 * p._2).sum -
        xs.sum * ys.sum) / (n * xs.map(x => x * x).sum - xs.sum * xs.sum)
      brand -> beta
    }
    got.foreach { g =>
      assert(math.abs(g._3 / 1e6 - unfrozen(g._1)) < 1e-4,
        s"frozen-vs-unfrozen beta drift for ${g._1}")
    }
  }

  test("q_mmr_select matches an independent greedy recount and is " +
    "more diverse than plain top-5") {
    val probe = vecs.find(_._1 == 0L).get._2
    val cands = vecs.filter(_._1 >= 8)
      .map { case (id, emb, _) =>
        (id, emb, math.round(cos(emb, probe) * 1e6)) }
      .sortBy(c => (-c._3, c._1)).take(20)
    val byId = cands.map(c => c._1 -> c).toMap
    def sim6(a: Long, b: Long) =
      math.round(cos(byId(a)._2, byId(b)._2) * 1e6)
    var sel = Vector.empty[(Long, Long, Long)]
    for (_ <- 1 to 5) {
      val rem = cands.filterNot(c => sel.exists(_._1 == c._1))
      val scored = rem.map { c =>
        val sc = if (sel.isEmpty) 7L * c._3
          else 7L * c._3 - 3L * sel.map(s => sim6(c._1, s._1)).max
        (c._1, c._3, sc)
      }
      sel = sel :+ scored.minBy(x => (-x._3, x._1))
    }
    val expect = sel.zipWithIndex.map { case ((v, r, sc), i) =>
      ((i + 1).toLong, v, r, sc) }
    val got = q("q_mmr_select")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == expect)
    // rank 1 is the pure-relevance argmax
    assert(got.head._2 == cands.head._1)
    // diversity property: the MMR set's minimum pairwise distance is
    // at least the plain top-5's (it optimizes exactly that tradeoff)
    def minDist(ids: Seq[Long]) = (for {
      a <- ids; b <- ids if a < b } yield 1e6 - sim6(a, b)).min
    val mmrIds = got.map(_._2).toSeq
    val topIds = cands.take(5).map(_._1)
    assert(minDist(mmrIds) >= minDist(topIds),
      s"MMR not more diverse: ${minDist(mmrIds)} < ${minDist(topIds)}")
  }

  test("q_fps_sample matches an independent greedy recount and " +
    "spreads wider than the first-8 panel") {
    val panel = vecs.filter(_._1 < 64)
    val byId = panel.map(p => p._1 -> p._2).toMap
    def d6(a: Long, b: Long) =
      math.round((1.0 - cos(byId(a), byId(b))) * 1e6)
    var sel = Vector((0L, 0L))
    for (_ <- 2 to 8) {
      val rem = panel.map(_._1).filterNot(c => sel.exists(_._1 == c))
      val pick = rem.map(c => (c, sel.map(s => d6(c, s._1)).min))
        .minBy(x => (-x._2, x._1))
      sel = sel :+ pick
    }
    val expect = sel.zipWithIndex.map { case ((v, md), i) =>
      ((i + 1).toLong, v, md) }
    val got = q("q_fps_sample")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == expect)
    // spread property: greedy k-center picks are at least as spread
    // as the arbitrary first-8 slice of the panel
    def minPair(ids: Seq[Long]) = (for {
      a <- ids; b <- ids if a < b } yield d6(a, b)).min
    assert(minPair(got.map(_._2).toSeq) >=
      minPair(panel.map(_._1).take(8)))
    // each reported min_dist is non-increasing (the k-center chain)
    got.map(_._3).drop(1).sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
  }
}
