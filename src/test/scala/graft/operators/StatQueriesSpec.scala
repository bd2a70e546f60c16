package graft.operators

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Property tests for the round-6 statistical-audit and dedup queries —
  * invariants the DuckDB oracle cannot express (cross-formulation
  * equality, sketch guarantees, blocking recall vs brute force). */
class StatQueriesSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("q_auc: two-phase cumulative equals the naive global-window AUC") {
    import spark.implicits._
    // Naive single-window reference formulation (the one we deliberately
    // did NOT ship because its window is unpartitioned): if the two-phase
    // bucket decomposition is wrong, these diverge.
    val sc = graft.Tables.load(spark, d, "documents")
      .groupBy($"n_chars".as("score"))
      .agg(sum(when($"lang" === "en", 1L).otherwise(0L)).as("pos"),
        sum(when($"lang" === "en", 0L).otherwise(1L)).as("neg"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"score")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val naive = sc.withColumn("cnb", coalesce(sum($"neg").over(w), lit(0L)))
      .agg(sum($"pos" * (lit(2L) * $"cnb" + $"neg")).as("u2"),
        sum($"pos").as("np"), sum($"neg").as("nn"))
      .select($"u2", $"np", $"nn").head()
    val got = SparkEntry.queries("q_auc")(spark, d).head()
    assert(got.getAs[Long]("u2") === naive.getAs[Long]("u2"))
    assert(got.getAs[Long]("n_pos") === naive.getAs[Long]("np"))
    val auc = got.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("q_bigram_lm: cross-entropy positive; uniform-LM bound holds") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_bigram_lm")(spark, d).collect()
    assert(rows.length === 500)
    // Add-1 smoothing caps any conditional prob at 1, so -avg log p > 0;
    // and the per-doc average can never beat the best single bigram's
    // -log p_max where p_max ≤ (n_ab+1)/(n_a+V) ≤ 1 — the cheap sanity
    // band is (0, ln(n_a_max + V)] which we bound loosely by ln of the
    // corpus bigram total + vocab.
    val bg = graft.Tables.load(spark, d, "documents")
      .select(explode(graft.Fns.tokens($"text")).as("t"))
    val v = bg.agg(countDistinct($"t")).head().getLong(0)
    val n = bg.count()
    val hi = math.log((n + v).toDouble)
    rows.foreach { r =>
      val ce = r.getAs[Double]("cross_entropy")
      assert(ce > 0.0 && ce <= hi, s"doc ${r.get(0)}: ce=$ce out of (0, $hi]")
      assert(r.getAs[Long]("n_bigrams") >= 1L)
    }
  }

  test("q_two_hop: frontier counts bounded by graph cardinalities") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_two_hop")(spark, d).collect()
    assert(rows.length === 20)
    val o = graft.Tables.load(spark, d, "orders")
    val li = graft.Tables.load(spark, d, "lineitem")
    val nSup = li.select($"l_suppkey").distinct().count()
    val nCust = o.select($"o_custkey").distinct().count()
    rows.foreach { r =>
      val d1 = r.getAs[Long]("n_direct"); val d2 = r.getAs[Long]("n_two_hop")
      assert(d1 >= 1L && d1 <= nSup)
      // hop 2 excludes the seed itself, so strictly fewer than all customers
      assert(d2 >= 0L && d2 < nCust)
    }
  }

  test("q_ndcg: bounded by 1, dcg never exceeds ideal dcg") {
    val rows = SparkEntry.queries("q_ndcg")(spark, d).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val dcg = r.getAs[Double]("dcg10"); val idcg = r.getAs[Double]("idcg10")
      val n = r.getAs[Double]("ndcg10")
      assert(dcg >= 0.0 && dcg <= idcg + 1e-9, s"dcg $dcg > idcg $idcg")
      assert(n >= 0.0 && n <= 1.0 + 1e-9)
    }
  }

  test("q_woe_iv: IV non-negative, terms sum to the total") {
    val rows = SparkEntry.queries("q_woe_iv")(spark, d).collect()
    assert(rows.length === 10)
    // (pp-qq) and ln(pp/qq) always share sign, so every term and the
    // total are ≥ 0 — a sign bug in either factor breaks this.
    val termSum = rows.map(_.getAs[Double]("iv_term")).sum
    rows.foreach { r =>
      assert(r.getAs[Double]("iv_term") >= -1e-12)
      assert(math.abs(r.getAs[Double]("iv_total") - termSum) < 1e-4)
    }
  }

  test("q_pr_curve: recall monotone down-threshold, ends at 1; precision bounded") {
    val rows = SparkEntry.queries("q_pr_curve")(spark, d).collect()
    assert(rows.nonEmpty)
    // rows come ordered bin DESC = loosening threshold: recall can only grow
    val recalls = rows.map(_.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a - 1e-12 })
    assert(math.abs(recalls.last - 1.0) < 1e-9)
    rows.foreach { r =>
      val p = r.getAs[Double]("precision")
      assert(p >= 0.0 && p <= 1.0)
      assert(r.getAs[Long]("cum_pos") <= r.getAs[Long]("cum_n"))
    }
  }

  test("q_lsh_bucket_join: pairs agree with q_minhash_sig band keys both ways") {
    val got = SparkEntry.queries("q_lsh_bucket_join")(spark, d).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) ->
        r.getAs[Long]("n_bands")).toMap
    // q_minhash_sig computes the same signatures WITHOUT the shingle
    // distinct (MIN is duplicate-insensitive, so they must agree): every
    // band collision there must surface here with the matching band
    // count, and vice versa — completeness AND soundness of the bucket
    // join, plus the distinct-invariance of the signature math.
    val sigs = SparkEntry.queries("q_minhash_sig")(spark, d).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("band1"), r.getAs[String]("band2")))
    val expected = (for {
      (a, a1, a2) <- sigs; (b, b1, b2) <- sigs if a < b
      n = (if (a1 == b1) 1 else 0) + (if (a2 == b2) 1 else 0) if n > 0
    } yield (a, b) -> n.toLong).toMap
    assert(expected.nonEmpty, "fixture should produce band collisions")
    assert(got.keySet === expected.keySet,
      s"missing=${(expected.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- expected.keySet).take(5)}")
    expected.foreach { case (k, n) => assert(got(k) === n, s"pair $k") }
  }

  test("q_dedup_yield: yield monotone non-increasing in threshold") {
    val rows = SparkEntry.queries("q_dedup_yield")(spark, d).collect()
    assert(rows.length === 5)
    val yields = rows.map(_.getAs[Long]("n_dup_docs"))
    // raising the bar can only shrink the >=t pair set, so the dropped-doc
    // count can only fall; a violation means the theta-join leaks pairs
    assert(yields.zip(yields.tail).forall { case (a, b) => b <= a },
      yields.mkString(","))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup_docs") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q_embed_drift: cosine bounded, halves partition each label's vectors") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_embed_drift")(spark, d).collect()
    assert(rows.nonEmpty)
    val perLabel = graft.Tables.load(spark, d, "embeddings")
      .groupBy($"label").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Int]("label").toLong -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val c = r.getAs[Double]("drift_cos")
      // no positivity assumption: at sf0.001 a half is ~2 vectors and the
      // two noisy centroids can legitimately anti-correlate
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"cos $c out of range")
      assert(r.getAs[Long]("n_even") + r.getAs[Long]("n_odd") ===
        perLabel(r.getAs[Int]("label").toLong))
    }
  }

  test("q_heaps: sublinear growth (0 < beta < 1), positive K") {
    val r = SparkEntry.queries("q_heaps")(spark, d).head()
    val beta = r.getAs[Double]("heaps_beta")
    // vocabulary can't outgrow the corpus (beta < 1) and always grows
    // (beta > 0) on natural-ish text; K is a positive scale factor
    assert(beta > 0.0 && beta < 1.0, s"beta $beta")
    assert(r.getAs[Double]("heaps_k") > 0.0)
  }

  test("q_token_fertility: BPE splits at least one token per word") {
    val rows = SparkEntry.queries("q_token_fertility")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the BPE-ish regex never merges across whitespace, so fertility >= 1
      assert(r.getAs[Double]("fertility") >= 1.0, s"lang ${r.get(0)}")
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_words"))
    }
  }

  test("q_ngram_coverage: covered never exceeds total, ratio bounded") {
    val rows = SparkEntry.queries("q_ngram_coverage")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cov = r.getAs[Double]("coverage")
      assert(r.getAs[Long]("n_covered") <= r.getAs[Long]("n_shingles"))
      assert(cov >= 0.0 && cov <= 1.0)
    }
  }

  test("q_simhash_near: chunk blocking lossless vs brute-force hamming<=3") {
    import spark.implicits._
    val got = SparkEntry.queries("q_simhash_near")(spark, d).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    // pigeonhole: <=3 differing bits over 4 chunks leaves >=1 chunk equal,
    // so the bucket join must find EVERY <=3 pair the all-pairs scan finds
    // (fingerprints from the query's own 64-bit two-half builder)
    val fps = Dedup.simhash64(spark, d).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("fp_hi"), r.getAs[Long]("fp_lo")))
    val brute = (for {
      (a, ha, la) <- fps; (b, hb, lb) <- fps if a < b
      if java.lang.Long.bitCount(ha ^ hb) +
        java.lang.Long.bitCount(la ^ lb) <= 3
    } yield (a, b)).toSet
    assert(got === brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
  }

  test("q_countmin: estimates never undercount (CM guarantee)") {
    val rows = SparkEntry.queries("q_countmin")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"CM undercounted ${r.getAs[String]("tok")}")
      assert(r.getAs[Long]("cm_est") >= r.getAs[Long]("exact"))
    }
  }

  test("q_edit_blocking: recall 1.0 vs brute-force all-pairs on sf0.001") {
    import spark.implicits._
    val n = graft.Tables.load(spark, d, "documents").select($"doc_id",
      $"lang", regexp_replace(lower(trim($"text")), "\\s+", " ").as("t"))
    val brute = n.alias("a").join(n.alias("b"),
        $"a.lang" === $"b.lang" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
        levenshtein($"a.t", $"b.t").cast("long").as("dist"),
        greatest(length($"a.t"), length($"b.t")).cast("long").as("maxlen"))
      .filter(lit(5L) * $"dist" <= $"maxlen")
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    val got = SparkEntry.queries("q_edit_blocking")(spark, d)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(got === brute,
      s"blocking missed ${(brute -- got).size} pairs, invented ${(got -- brute).size}")
  }

  test("q_chi2: dof matches the margins, statistic non-negative") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, d, "documents")
    val nr = docs.select($"lang").distinct().count()
    val nc = docs.select($"source").distinct().count()
    val r = SparkEntry.queries("q_chi2")(spark, d).head()
    assert(r.getAs[Long]("dof") === (nr - 1) * (nc - 1))
    assert(r.getAs[Double]("chi2") >= 0.0)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
  }

  test("q_jsd bounded in [0,1] bits; q_autocorr in [-1,1]; q_trend R2 in [0,1]") {
    val jsd = SparkEntry.queries("q_jsd")(spark, d)
      .head().getAs[Double]("jsd_bits")
    assert(jsd >= 0.0 && jsd <= 1.0)
    SparkEntry.queries("q_autocorr")(spark, d).collect().foreach { r =>
      val a = r.getAs[Double]("acf")
      assert(a >= -1.0 && a <= 1.0, s"acf out of range: $a")
    }
    SparkEntry.queries("q_trend")(spark, d).collect().foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= -1e-9 && r2 <= 1.0 + 1e-9, s"r2 out of range: $r2")
    }
  }

  test("q_ks_test: two-phase D equals the naive global-window KS") {
    import spark.implicits._
    val sc = graft.Tables.load(spark, d, "documents")
      .groupBy($"n_chars".as("score"))
      .agg(sum(when($"lang" === "en", 1L).otherwise(0L)).as("a"),
        sum(when($"lang" === "en", 0L).otherwise(1L)).as("b"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"score")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val naive = sc
      .withColumn("ca", sum($"a").over(w)).withColumn("cb", sum($"b").over(w))
      .crossJoin(broadcast(sc.agg(sum($"a").as("na"), sum($"b").as("nb"))))
      .select($"score", abs($"ca" * $"nb" - $"cb" * $"na").as("dev"))
      .orderBy($"dev".desc, $"score").limit(1).head()
    val got = SparkEntry.queries("q_ks_test")(spark, d).head()
    assert(got.getAs[Long]("dev_num") === naive.getAs[Long]("dev"))
    assert(got.getAs[Long]("argmax_score") === naive.getAs[Long]("score"))
    val ksd = got.getAs[Double]("ks_d")
    assert(ksd >= 0.0 && ksd <= 1.0)
  }

  test("q_psi: non-negative with exactly 10 smoothed bins") {
    // Each (p−q)·ln(p/q) term is ≥ 0, so PSI ≥ 0 for ANY drift; Laplace
    // smoothing guarantees all 10 bins exist on both halves.
    val r = SparkEntry.queries("q_psi")(spark, d).head()
    assert(r.getAs[Long]("n_bins") === 10L)
    assert(r.getAs[Double]("psi") >= 0.0)
  }

  test("q_bloom: zero false negatives — positives split exactly") {
    // The Bloom guarantee: member ⇒ every position hits ⇒ counted
    // positive. So per lang: bloom_positives = exact_members (true
    // positives, none lost) + false_positives.
    val rows = SparkEntry.queries("q_bloom")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bp = r.getAs[Long]("bloom_positives")
      val em = r.getAs[Long]("exact_members")
      val fp = r.getAs[Long]("false_positives")
      assert(bp === em + fp, s"lang ${r.getAs[String]("lang")}")
      assert(bp <= r.getAs[Long]("n_docs"))
    }
  }

  test("q_zone_map: pruning is lossless and matches a direct filter") {
    import spark.implicits._
    val r = SparkEntry.queries("q_zone_map")(spark, d).head()
    assert(r.getAs[Long]("files_pruned") <= r.getAs[Long]("n_files"))
    assert(r.getAs[Long]("rows_scanned") <= r.getAs[Long]("rows_total"))
    assert(r.getAs[Long]("rows_match") <= r.getAs[Long]("rows_scanned"))
    val li = graft.Tables.load(spark, d, "lineitem")
      .select(to_date($"l_shipdate").as("ship"))
    val cut = li.agg(date_add(min($"ship"), 1200)).head().getDate(0)
    assert(r.getAs[Long]("rows_match") ===
      li.filter($"ship" >= lit(cut)).count())
    assert(r.getAs[Long]("rows_total") === li.count())
  }

  test("q_ivf_recall: recall monotone in nprobe, bounded, exact n=10") {
    val rows = SparkEntry.queries("q_ivf_recall")(spark, d).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") === 10L)
      val r1 = r.getAs[Double]("recall_p1"); val r3 = r.getAs[Double]("recall_p3")
      // Probing a superset of cells can only add candidates that outrank
      // (or tie into) the top-10, never remove true hits below p1's.
      assert(r3 >= r1, s"q ${r.getAs[Long]("q_id")}: p3 $r3 < p1 $r1")
      assert(r1 >= 0.0 && r3 <= 1.0)
    }
  }

  test("q_containment: directions consistent with the Jaccard pair set") {
    // Containment ≥ Jaccard for every pair (|A∩B|/min-side ≥ |A∩B|/|A∪B|),
    // and the keeper is always one of the pair.
    SparkEntry.queries("q_containment")(spark, d).collect().foreach { r =>
      val c1 = r.getAs[Double]("c_in_d1"); val c2 = r.getAs[Double]("c_in_d2")
      assert(c1 >= 0.0 && c1 <= 1.0 && c2 >= 0.0 && c2 <= 1.0)
      val keep = r.getAs[Long]("keep")
      assert(keep == r.getAs[Long]("d1") || keep == r.getAs[Long]("d2"))
    }
  }
}
