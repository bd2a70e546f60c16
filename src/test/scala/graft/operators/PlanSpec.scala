package graft.operators

import graft.{SparkSpec, SparkEntry}

/** Physical-plan regression tests: the SCALE.md-documented plan properties,
  * asserted so a refactor can't silently trade them away. Runs at sf0.001
  * (plan shape, not data volume, is under test). */
class PlanSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString

  test("q_scan_project: filter pushed to parquet, schema pruned") {
    val p = plan("q_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5.0)]"), p.take(800))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double>"))
  }

  test("q_agg_basic: partial (map-side) aggregation before the exchange") {
    val p = plan("q_agg_basic")
    assert(p.contains("partial_sum"), p.take(800))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
  }

  test("q_fact_join: dimension attach is a broadcast join, no fact shuffle") {
    val p = plan("q_fact_join")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q_join_multi: small dimensions broadcast") {
    val p = plan("q_join_multi")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q_sort_limit and q_similarity: top-k via TakeOrderedAndProject") {
    assert(plan("q_sort_limit").contains("TakeOrderedAndProject"))
    assert(plan("q_similarity").contains("TakeOrderedAndProject"))
  }

  test("q_percentile: map-side partial percentile buffers before exchange") {
    val p = plan("q_percentile")
    assert(p.contains("partial_percentile"), p.take(800))
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_returnflag:string>"))
  }

  test("q_string_agg: nation broadcast, partial collect before exchange") {
    val p = plan("q_string_agg")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(p.contains("partial_collect_list"), p.take(800))
  }

  test("q_histogram: partial agg on bucket key, single-column scan") {
    val p = plan("q_histogram")
    assert(p.contains("partial_count"), p.take(800))
    assert(p.contains("ReadSchema: struct<l_extendedprice:double>"), p.take(800))
  }

  test("q_lag_lead: one partition exchange feeds both offset windows") {
    val p = plan("q_lag_lead")
    // lag and lead share a single Window node over one hashpartitioning
    // exchange — not one shuffle per function
    assert(p.linesIterator.count(_.contains("Window [")) == 1, p.take(1200))
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      p.take(1200))
  }

  test("q_sample_hash: stateless predicate, zero hash exchanges") {
    val p = plan("q_sample_hash")
    assert(!p.contains("Exchange hashpartitioning"), p.take(1000))
  }

  test("q_corpus_prep: rank-limit pushdown + partial agg, two exchanges") {
    val p = plan("q_corpus_prep")
    // WindowGroupLimit drops all but the top-1 row per fingerprint BEFORE
    // the row_number window materializes
    assert(p.contains("WindowGroupLimit"), p.take(1200))
    assert(p.contains("partial_count"), p.take(1200))
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2)
  }

  test("q_moving_avg: range frame over a single partition exchange") {
    val p = plan("q_moving_avg")
    assert(p.contains("RangeFrame"), p.take(1200))
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1)
  }

  test("q_chunk_docs: one generator, no hash shuffle before the output sort") {
    val p = plan("q_chunk_docs")
    assert(p.linesIterator.count(_.contains("Generate posexplode")) == 1, p.take(1200))
    assert(!p.contains("Exchange hashpartitioning"), p.take(1200))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("q_tfidf: single corpus scan — df from a window over tf, not a re-scan") {
    val p = plan("q_tfidf")
    // exactly one explode of the corpus (tf); df reuses it via the window
    assert(p.linesIterator.count(_.contains("Generate explode")) == 1, p.take(1500))
    assert(p.contains("TakeOrderedAndProject"))
    // the only broadcast is the one-row corpus count
    assert(p.linesIterator.count(_.contains("BroadcastExchange")) == 1, p.take(1500))
    // pinned plan economics (VERDICT r3 #3): exactly two hash exchanges —
    // the (doc_id, word) tf aggregation and the word-keyed window for df.
    // A third would mean df re-derives or the window re-shuffles.
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2,
      p.take(2000))
    assert(p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning(word")), p.take(2000))
  }

  test("q_lang_id: broadcast lexicon join, one doc-keyed exchange, no HOFs") {
    val p = plan("q_lang_id")
    // lexicon attaches as a broadcast dim; scoring is conditional partial
    // aggregation — exactly one hash exchange, keyed on the doc
    assert(p.linesIterator.count(_.contains("BroadcastExchange")) == 1, p.take(1500))
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      p.take(2000))
    assert(p.contains("partial_sum") || p.contains("partial sum") ||
      p.linesIterator.exists(l => l.contains("HashAggregate") && l.contains("partial")),
      p.take(2000))
    // the old interpreted per-language array-filter scoring must not creep
    // back: the one residual lambda is the tokenizer's empty-string filter
    // (shared with every text query), so pin lambda count == 1, not 4+.
    assert(p.linesIterator.flatMap(l =>
      "lambdafunction".r.findAllIn(l)).size <= 1, p.take(2000))
    // scoring itself is plain conditional sums
    assert(p.contains("sum(CASE WHEN"), p.take(2000))
  }

  test("q_embed_pool: long micro-unit sums — no decimal math in the hot path") {
    val p = plan("q_embed_pool")
    // two-stage overflow-safe sum (ADVICE r4): a partial-agg shuffle on
    // (label, pos, physical partition) where sums stay integral, then a
    // tiny (num_partitions rows/group) merge shuffle on (label, pos)
    // where decimal(38,0) is allowed — the ONLY place it is.
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2,
      p.take(2500))
    // the per-element stage must be pure long arithmetic: no decimal may
    // appear below the salted aggregate (i.e. in the same line as the
    // micro-unit round/cast)
    val hotLines = p.linesIterator.filter(_.contains("as bigint")).toSeq
    assert(hotLines.nonEmpty && hotLines.forall(!_.toLowerCase.contains("decimal(")),
      p.take(2500))
    // decimal appears only in the merge-stage sum over stage-1 partials
    assert(p.linesIterator.forall(l =>
      !l.toLowerCase.contains("decimal(") || l.contains("psum")), p.take(2500))
  }

  test("q_set_ops: customer side broadcasts, set-op aggs have map-side partials") {
    val p = plan("q_set_ops")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    // distinct projections shuffle only after a partial aggregate
    val aggs = p.linesIterator.count(_.contains("HashAggregate(keys=[c_nationkey"))
    assert(aggs >= 4, s"expected partial+final aggs per set-op branch, got $aggs")
  }

  test("q_null_funcs: pure projection — zero hash shuffles, pruned 3-col scan") {
    val p = plan("q_null_funcs")
    assert(!p.contains("Exchange hashpartitioning"), p.take(1000))
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_acctbal:double,c_mktsegment:string>"))
  }

  test("q_minhash_lsh: bucketed candidates only — no cartesian, capped buckets") {
    val p = plan("q_minhash_lsh")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("bucket_n"), p.take(1500)) // hot-bucket cap window present
  }

  test("q_tpch_q5: fact table never shuffles — one agg exchange, dims broadcast") {
    val p = plan("q_tpch_q5")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      p.take(1500))
    assert(p.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint," +
        "l_extendedprice:double,l_discount:double>"), p.take(1500))
    assert(p.contains("r_name = ASIA") || p.contains("(r_name#"), p.take(1500))
  }

  test("rank-filter queries push the limit INTO the window (WindowGroupLimit)") {
    // rank()<=k / row_number()=1 filters must become per-group limits that
    // drop rows before the full window sort buffers them — at 100 TB this
    // is the difference between a bounded heap and a per-key sort spill.
    Seq("q_window_rank", "q_knn_join", "q_corpus_prep").foreach { q =>
      assert(plan(q).contains("WindowGroupLimit"), s"$q lacks WindowGroupLimit")
    }
  }

  test("q_exists_subquery: EXISTS/NOT EXISTS become semi + anti joins") {
    val p = plan("q_exists_subquery")
    assert(p.contains("LeftSemi"), p.take(1200))
    assert(p.contains("LeftAnti"), p.take(1200))
    assert(!p.contains("NestedLoop"), p.take(1200))
  }

  test("q_lateral_topk: per-row LIMIT decorrelates to a rank window, no loop") {
    val p = plan("q_lateral_topk")
    assert(p.contains("Window"), p.take(1500))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      p.take(1500))
  }

  test("q_contamination: benchmark shingle set broadcasts, corpus side flows") {
    val p = plan("q_contamination")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q_range_join: naive inequality join auto-banded by RangeJoinRewrite") {
    val p = plan("q_range_join")
    assert(p.contains("__graft_band"), p.take(1500))
    assert(!p.contains("NestedLoop"), p.take(1500))
  }

  test("q_asof_join: native AsOfJoin operator, no window fallback") {
    val p = plan("q_asof_join")
    assert(p.contains("AsOfJoin"), p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
  }

  test("q_funnel: every hash exchange keys on user_id — one co-partitioning") {
    val p = plan("q_funnel")
    val keys = "hashpartitioning\\(([A-Za-z0-9_#]+)".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(keys.nonEmpty && keys.forall(_.startsWith("user_id")),
      s"unexpected exchange keys: $keys")
  }

  test("q_retention and q_pmi_bigrams: map-side partial aggregation") {
    Seq("q_retention", "q_pmi_bigrams").foreach { q =>
      val p = plan(q)
      assert(p.contains("partial_"), s"$q: ${p.take(1200)}")
    }
  }

  test("q_minhash_sig: all 8 signature mins ride ONE doc-keyed exchange") {
    val p = plan("q_minhash_sig")
    assert(p.contains("partial_min"), p.take(1200))
    // one hashpartitioning exchange on doc_id (plus the final sort's range
    // exchange) — the 8 permutations must never fan out into per-perm jobs
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      p.take(1200))
  }

  test("q_unigram_surprise: LM attaches as broadcast, scoring has partial agg") {
    val p = plan("q_unigram_surprise")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("partial_count"), p.take(1200))
  }

  test("q_bigram_lm: keyed shuffles only — partial aggs, no cartesian") {
    val p = plan("q_bigram_lm")
    assert(p.contains("partial_count"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("q_two_hop: seed filter before expansion, hash joins, no cartesian") {
    val p = plan("q_two_hop")
    // 20 seed values exceed inSetConversionThreshold, so In becomes INSET
    assert(p.contains("src#") && (p.contains("INSET") || p.contains(" IN (")),
      p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("q_ndcg: rank windows q_id-partitioned, probe sides broadcast") {
    val p = plan("q_ndcg")
    assert(p.contains("windowspecdefinition(q_id"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("q_woe_iv and q_pr_curve: one partial-agg shuffle, no cartesian blowup") {
    Seq("q_woe_iv", "q_pr_curve").foreach { q =>
      val p = plan(q)
      assert(p.contains("partial_sum"), s"$q: ${p.take(1200)}")
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(1200)}")
    }
  }

  test("q_lsh_bucket_join: bucket join keyed, partial mins, no cartesian") {
    // r15: the signature table materializes via localCheckpoint in the
    // registered query, so the min battery's plan lives in the
    // PRE-checkpoint builder — pin the map-side partial mins there and
    // the no-blowup invariants on the final (post-checkpoint) plan
    val sig = Dedup.lshSignatures(Dedup.lshShingleTable(spark, d))
      .queryExecution.executedPlan.toString
    assert(sig.contains("partial_min"), sig.take(1500))
    val p = plan("q_lsh_bucket_join")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("q_simhash_near: chunk-keyed bucket join, no cartesian") {
    val p = plan("q_simhash_near")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("q_ngram_coverage: shingle-keyed shuffle join with partial aggs") {
    val p = plan("q_ngram_coverage")
    assert(p.contains("partial_"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q_embed_drift and q_heaps: partial aggs, no cartesian blowup") {
    Seq("q_embed_drift", "q_heaps").foreach { q =>
      val p = plan(q)
      assert(p.contains("partial_"), s"$q: ${p.take(1200)}")
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(1200)}")
    }
  }

  test("q_token_fertility: single scan, lang-keyed partial agg, no explode") {
    val p = plan("q_token_fertility")
    assert(p.contains("partial_count"), p.take(1200))
    assert(!p.contains("Generate"), p.take(1200)) // regexp counts, no explode
  }

  test("q_gopher_rules: per-token counts aggregate map-side first") {
    val p = plan("q_gopher_rules")
    assert(p.contains("partial_count"), p.take(1200))
  }

  test("q_pq_search: probe broadcast, top-k via TakeOrderedAndProject") {
    val p = plan("q_pq_search")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(p.contains("Broadcast"), p.take(1200))
    // encode + ADC are pure per-row expressions: no hash exchange anywhere
    assert(!p.contains("Exchange hashpartitioning"), p.take(1200))
  }

  test("q_event_pattern: journeys build on ONE user-keyed exchange") {
    val p = plan("q_event_pattern")
    assert(p.contains("partial_collect_list"), p.take(1200))
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      p.take(1200))
  }

  test("q_embed_outliers: centroid table broadcast, top-k TakeOrdered") {
    val p = plan("q_embed_outliers")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
  }

  test("q_prefix_join sets: no single-partition exchange (distributed dict)") {
    // VERDICT r5 #1: the shingle dictionary must be the zipWithIndex
    // assigner, not a row_number window — an Exchange SinglePartition here
    // would funnel the whole distinct-shingle universe (billions of rows at
    // 100 TB) through one task. Assert on the UNCHECKPOINTED sets builder:
    // q_prefix_join itself localCheckpoints it, which truncates the plan
    // and would make this pin vacuous. The df-count window (partitioned by
    // shingle) is fine; an unpartitioned rank window is not.
    val p = Dedup.prefixSets(spark, d).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"), p.take(3000))
    assert(!p.contains("row_number"), p.take(3000))
  }

  test("q_bm25: probe-term filter before explode shuffle, top-k TakeOrdered") {
    val p = plan("q_bm25")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("q_trend_slope: regression stats partial-aggregate map-side") {
    val p = plan("q_trend_slope")
    assert(p.contains("partial_sum"), p.take(1200))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("q_calibration: weight table broadcast, partial agg on doc key") {
    val p = plan("q_calibration")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("partial_count"), p.take(1200))
  }

  test("q_join_skew_audit: per-key counts partial-aggregate before exchange") {
    val p = plan("q_join_skew_audit")
    assert(p.contains("partial_count"), p.take(1200))
  }

  test("q_theta_overlap: lazy plan — no eager job in the query builder") {
    // The sketch build/union/intersect must live INSIDE the plan (typed
    // MapGroups/MapElements), not as a driver-side collect during
    // construction — an eager action would re-run per bench rep and make
    // plan construction side-effecting (the q_market_basket lesson).
    // Every spark.read.parquet re-reads footers (one small job), so a
    // flat zero-job assertion is impossible; instead compare against a
    // control query over the SAME table — the collect-based formulation
    // this test guards against would add a full partials job (and more
    // tasks) on every construction.
    def jobsFor(q: String): Int = {
      val before = spark.sparkContext.statusTracker
        .getJobIdsForGroup(null).length
      SparkEntry.queries(q)(spark, d)
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - before
    }
    val control = jobsFor("q_transition_matrix") // events-only, known lazy
    val theta = jobsFor("q_theta_overlap")
    assert(theta <= control * 2,
      s"builder launched $theta jobs vs control $control — eager action?")
    val p = SparkEntry.queries("q_theta_overlap")(spark, d)
      .queryExecution.executedPlan.toString
    assert(p.contains("MapGroups"), p.take(1200))
  }

  test("q_auc: data-volume cumulative runs bucket-partitioned, not global") {
    val p = plan("q_auc")
    // The per-score cumulative window must be PARTITIONED by bucket (the
    // two-phase form) — a global ORDER BY window over the score table
    // would be the q_prefix_join single-partition mistake all over again.
    assert(p.contains("windowspecdefinition(bucket"), p.take(1500))
    assert(p.contains("Exchange hashpartitioning(bucket"), p.take(1500))
  }

  test("q_ks_test: cross-CDF cumulative runs bucket-partitioned, not global") {
    val p = plan("q_ks_test")
    // Same two-phase decomposition as q_auc: the per-score cumulative must
    // be partitioned by bucket; only the ~#buckets offset table may pass
    // through a global-order window.
    assert(p.contains("windowspecdefinition(bucket"), p.take(1500))
    assert(p.contains("Exchange hashpartitioning(bucket"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q_psi: bin math runs on the checkpointed grid — no fact scan, " +
    "anchors broadcast") {
    val p = plan("q_psi")
    // the per-event partial-agg shuffle (and the min-day anchor) run ONCE
    // inside the half x bin grid's checkpoint build (r13 audit fix:
    // singlepart x7 -> x2); the audited plan works the <= 20-row grid
    assert(p.split("FileScan").length - 1 == 0,
      "bin smoothing must run on the checkpointed grid, not the fact")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    val singles = p.split("\n").count(_.contains("Exchange SinglePartition"))
    assert(singles <= 2, s"$singles single-partition exchanges (want <=2)")
  }

  test("q_bloom: filter and membership sides broadcast, no cartesian") {
    val p = plan("q_bloom")
    // The set-bit table and the exact-membership side are both broadcast
    // (bounded by m / built-set size); the probe side never shuffles for
    // the joins — only the final per-lang partial agg exchanges.
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("q_zone_map: file-keyed partial agg, cutoff broadcast") {
    val p = plan("q_zone_map")
    assert(p.contains("partial_count"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q_ivf_recall: rank windows q_id-partitioned, probe sides broadcast") {
    val p = plan("q_ivf_recall")
    assert(p.contains("windowspecdefinition(q_id"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("q_edit_blocking: capped blocks, hash joins only — no cartesian") {
    val p = plan("q_edit_blocking")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // Block-size cap window is partitioned by the blocking key.
    assert(p.contains("windowspecdefinition(lang"), p.take(1500))
  }

  test("q_countmin: sketch build partial-aggregates, estimates broadcast") {
    val p = plan("q_countmin")
    assert(p.contains("partial_sum"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q_ewma: date-banded self-join — no nested loop, band injected") {
    val p = plan("q_ewma")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      p.take(1500))
    assert(p.contains("__graft_band"), p.take(1500))
    assert(p.contains("partial_count"), p.take(1500)) // daily rollup partials
  }

  test("q_double_ewma: both band joins rewritten, no nested loop") {
    val p = plan("q_double_ewma")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      p.take(1500))
    assert(p.contains("__graft_band"), p.take(1500))
    assert(p.contains("partial_count"), p.take(1500)) // daily rollup partials
  }

  test("q_textrank: rank rounds run on the checkpointed edge table — " +
    "no fact scan, keyed joins only") {
    val p = plan("q_textrank")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the corpus bigram explode + (a,b) edge counts run ONCE inside the
    // co-occurrence table's checkpoint build (r13 audit fix:
    // singlepart x3 -> 0); both rank rounds join the checkpointed edges
    assert(p.split("FileScan").length - 1 == 0,
      "rank rounds must run on the checkpointed edge table, not the fact")
    assert(p.contains("partial_sum"), p.take(1500)) // weighted degrees
    // the 1-row node-count anchor broadcasts; rank messages join on
    // src/dst hash keys, never all-pairs
    assert(p.contains("BroadcastExchange"), p.take(1500))
  }

  test("q_k_anonymity: class table partial-aggs; thresholds + minima broadcast") {
    val p = plan("q_k_anonymity")
    assert(p.contains("partial_count"), p.take(1500))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p.take(1500)) // one-row/4-row sides
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("q_perceptron: model state broadcasts each round, updates partial-agg") {
    val p = plan("q_perceptron")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("partial_sum"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q_record_linkage: blocked join only, native jaro_winkler, capped") {
    val p = plan("q_record_linkage")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      p.take(1500))
    assert(p.contains("jaro_winkler"), p.take(1500)) // native expr, no UDF
    assert(p.contains("windowspecdefinition(p_brand"), p.take(1500)) // cap
  }

  test("q_kmeans: broadcast centroid rounds, keyed windows, no global " +
    "exchange") {
    val p = plan("q_kmeans")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // both assignment rounds broadcast the k centroid rows
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    // argmin windows are per-vector, centroid updates partial-aggregated;
    // nothing in the fit funnels through one partition
    assert(!p.contains("SinglePartition"), p.take(1500))
    assert(p.contains("windowspecdefinition(vec_id"), p.take(1500))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      p.take(1500))
  }

  test("q_naive_bayes: broadcast model tables; the only global exchanges " +
    "are the two 1-row scalar anchors") {
    val p = plan("q_naive_bayes")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    // vocab-size V and doc-total N are lazy plan scalars (the
    // q_market_basket anchor pattern): exactly two SinglePartition
    // reductions, each of an already-partial-aggregated input
    val singles = p.split("\n")
      .count(_.contains("Exchange SinglePartition"))
    assert(singles <= 2, s"$singles single-partition exchanges:\n" +
      p.take(1500))
  }

  test("q_bootstrap_ci: one pass, partial-aggregated, single scalar " +
    "reduction") {
    val p = plan("q_bootstrap_ci")
    // all 2R replicate sums are map-side partials into ONE 1-row
    // reduction — the whole bootstrap is a single scan, no resample pass
    assert(p.contains("partial_sum"), p.take(1200))
    val singles = p.split("\n")
      .count(_.contains("Exchange SinglePartition"))
    assert(singles == 1, s"$singles single-partition exchanges")
    assert(p.split("FileScan").length - 1 == 1,
      "bootstrap must scan the corpus exactly once")
  }

  test("q_dsir: 64-row ratio model broadcasts; doc scoring is partial-agg " +
    "+ top-k, no global sort") {
    val p = plan("q_dsir")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the importance model (64 log-ratio rows) attaches by broadcast —
    // the doc-side (doc,bucket) counts never reshuffle to meet it
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("partial_count"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q_tpch_q18: qualifying-order set broadcasts; top-100 via " +
    "TakeOrderedAndProject") {
    val p = plan("q_tpch_q18")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("partial_sum"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("q_learning_curve: one corpus scan, conditional partial sums, " +
    "single scalar reduction") {
    val p = plan("q_learning_curve")
    assert(p.split("FileScan").length - 1 == 1,
      "all five fractions + the test set must share ONE scan")
    assert(p.contains("partial_sum"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    val singles = p.split("\n").count(_.contains("Exchange SinglePartition"))
    assert(singles == 1, s"$singles single-partition exchanges")
  }

  test("q_tpch_q10: pushed fact filters, broadcast nation, top-20 via " +
    "TakeOrderedAndProject") {
    val p = plan("q_tpch_q10")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    // the returnflag filter must reach the lineitem scan
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), " +
      "EqualTo(l_returnflag,R)") ||
      p.contains("EqualTo(l_returnflag,R)"), p.take(3000))
  }

  test("q_seq_packing: keyed window (never a global ordered window), " +
    "one scan") {
    val p = plan("q_seq_packing")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.split("FileScan").length - 1 == 1, "one documents scan")
    // the cumulative sum partitions by source — no single-partition sort
    assert(p.contains("hashpartitioning(source"), p.take(3000))
  }

  test("q_chunk_overlap: closed-form chunk math — no explode, no window") {
    val p = plan("q_chunk_overlap")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.toLowerCase.contains("generate"),
      "chunk accounting must not explode chunk rows")
    assert(!p.contains("Window"), "closed form needs no window")
    assert(p.contains("partial_sum"), p.take(1500))
  }

  test("q_calibration_ece: one scan + broadcast 1-row bounds + " +
    "10-row integer agg") {
    val p = plan("q_calibration_ece")
    assert(!p.contains("CartesianProduct") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("partial_sum"), p.take(1500))
  }

  test("q_tpch_q6: all three predicates pushed to the scan, no join, " +
    "single-row map-combined agg") {
    val p = plan("q_tpch_q6")
    assert(!p.contains("Join"), "Q6 must not join")
    assert(p.split("FileScan").length - 1 == 1, "one lineitem scan")
    assert(p.contains("PushedFilters"), p.take(3000))
    for (f <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(p.replaceAll("\n", " ")
        .matches(s".*PushedFilters[^\\]]*$f.*"), s"$f not pushed")
    assert(p.contains("partial_sum"), p.take(1500))
  }

  test("q_tpch_q14: part dim broadcasts; date window pushed") {
    val p = plan("q_tpch_q14")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.replaceAll("\n", " ")
      .matches(".*PushedFilters[^\\]]*l_shipdate.*"), "date not pushed")
    assert(p.contains("partial_sum"), p.take(1500))
  }

  test("q_pass_at_k: one events scan, task-keyed agg, bounded k-explode") {
    val p = plan("q_pass_at_k")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.split("FileScan").length - 1 == 1, "one events scan")
    assert(p.contains("partial_count"), p.take(1500))
  }

  test("q_bradley_terry: broadcast part dim, no cartesian; pair join " +
    "keyed on orderkey") {
    // r15: the corpus-scale self-join materializes into the checkpointed
    // brand-pair table, so its shape pins live on the PRE-checkpoint
    // builder; the final plan keeps the no-cartesian invariant
    val pair = MlFit.btPairTable(spark, d)
      .queryExecution.executedPlan.toString
    assert(!pair.contains("CartesianProduct"), pair.take(1500))
    assert(pair.contains("BroadcastHashJoin"), pair.take(1500))
    assert(pair.contains("hashpartitioning(ok"), pair.take(3000))
    val p = plan("q_bradley_terry")
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q_tpch_q4: quarter orders broadcast into one lineitem scan; " +
    "EXISTS never shuffles the fact") {
    val p = plan("q_tpch_q4")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.split("FileScan").length - 1 == 2, "one scan per table")
    // lineitem must not be exchanged BEFORE the join: the only hash
    // exchanges are the post-join distinct + priority agg (both bounded
    // by the quarter's orders)
    assert(!p.contains("hashpartitioning(l_orderkey"),
      "fact shuffled before the broadcast join")
  }

  test("q_tpch_q7: nation-pair filter pushed into both dim sides; " +
    "supplier slice broadcasts") {
    val p = plan("q_tpch_q7")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("partial_sum"), p.take(1500))
    // the nation IN-pair predicate must reach the supplier/customer scans
    assert(p.replaceAll("\n", " ")
      .matches(".*PushedFilters[^\\]]*n_name.*"), "pair filter not pushed")
  }

  test("q_tpch_q8: filtered part dim broadcasts; date window pushed to " +
    "the orders scan") {
    val p = plan("q_tpch_q8")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.replaceAll("\n", " ")
      .matches(".*PushedFilters[^\\]]*o_orderdate.*"), "date not pushed")
    assert(p.contains("partial_sum"), p.take(1500))
  }

  test("q_tpch_q13: priority filter rides the join condition; " +
    "two-level aggregation") {
    val p = plan("q_tpch_q13")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // zero-order customers must survive: outer join, not inner
    assert(p.contains("LeftOuter") || p.contains("RightOuter"), p.take(3000))
    assert(p.contains("partial_count"), p.take(1500))
  }

  test("q_tpch_q17: both lineitem passes pruned by the broadcast part " +
    "slice; per-part avg joins back via broadcast") {
    val p = plan("q_tpch_q17")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("SortMergeJoin"),
      "every join here is broadcast-size by construction")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q_tpch_q19: disjunctive predicate stays inside the codegen " +
    "span — zero hash exchanges") {
    val p = plan("q_tpch_q19")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("Exchange hashpartitioning"),
      "Q19 must not shuffle: scan -> broadcast join -> filter -> agg")
    val singles = p.split("\n").count(_.contains("Exchange SinglePartition"))
    assert(singles == 1, s"$singles single-partition exchanges (want 1)")
  }

  test("q_tpch_q22: 1-row threshold via broadcast nested loop; " +
    "date-pruned anti join") {
    val p = plan("q_tpch_q22")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(p.contains("LeftAnti"), p.take(3000))
    assert(p.replaceAll("\n", " ")
      .matches(".*PushedFilters[^\\]]*o_orderdate.*"),
      "anti-join side not date-pruned at the scan")
  }

  test("q_tpch_q9: name-filtered part and supplier-nation broadcast; " +
    "no cartesian") {
    val p = plan("q_tpch_q9")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.replaceAll("\n", " ")
      .matches(".*PushedFilters[^\\]]*p_name.*"), "name filter not pushed")
    assert(p.contains("partial_sum"), p.take(1500))
  }

  test("q_tpch_q15: scalar max rides a 1-row broadcast onto the " +
    "supplier-grain aggregate, never the fact") {
    val p = plan("q_tpch_q15")
    // Catalyst turns the crossJoin + equality filter into a broadcast
    // HASH join keyed on the max — assert the broadcast family and the
    // absence of a real cartesian
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("partial_sum"), p.take(1500))
    assert(p.replaceAll("\n", " ")
      .matches(".*PushedFilters[^\\]]*l_shipdate.*"), "date not pushed")
  }

  test("q_tpch_q21: double EXISTS as order-grain aggregates — no self " +
    "join; window shares the agg's order partitioning") {
    val p = plan("q_tpch_q21")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.split("FileScan").length - 1 == 3,
      "one scan per table: the EXISTS pair must not rescan lineitem")
    assert(p.contains("hashpartitioning(l_orderkey"), p.take(3000))
  }

  test("q_tpch_q12: ship-year window pushed to the scan; CASE counts " +
    "after one fact join") {
    val p = plan("q_tpch_q12")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.replaceAll("\n", " ")
      .matches(".*PushedFilters[^\\]]*l_shipdate.*"), "date not pushed")
    assert(p.contains("partial_sum"), p.take(1500))
  }

  test("q_tpch_q16: NOT IN as broadcast anti join; one pair-distinct " +
    "shuffle") {
    val p = plan("q_tpch_q16")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("LeftAnti"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q_cohen_kappa: one documents scan, conditional partial sums, " +
    "single 1-row reduction") {
    val p = plan("q_cohen_kappa")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.split("FileScan").length - 1 == 1, "one documents scan")
    assert(p.contains("partial_sum"), p.take(1500))
    val singles = p.split("\n").count(_.contains("Exchange SinglePartition"))
    assert(singles == 1, s"$singles single-partition exchanges (want 1)")
  }

  test("q_majority_vote: one events scan, task-keyed window shared by " +
    "cut and mode, no cartesian") {
    val p = plan("q_majority_vote")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.split("FileScan").length - 1 == 1, "one events scan")
    assert(p.contains("hashpartitioning(task"), p.take(3000))
  }

  test("q_fleiss_kappa: ONE events scan (the branch-free conditional-sum " +
    "formulation), one task window, 1-row reduce") {
    val p = plan("q_fleiss_kappa")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.split("FileScan").length - 1 == 1,
      "the (task,cat) branch point would scan events twice")
    assert(p.contains("hashpartitioning(task"), p.take(3000))
    val singles = p.split("\n").count(_.contains("Exchange SinglePartition"))
    assert(singles == 1, s"$singles single-partition exchanges (want 1)")
  }

  test("q_eval_funnel: task-keyed windows, no cartesian, no global " +
    "ordered window; consolidated to <=2 single-partition reduces") {
    val p = plan("q_eval_funnel")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("hashpartitioning(task"), p.take(3000))
    // every window is task-partitioned — a global ordered window would
    // appear as an empty partition spec
    assert(!p.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"),
      "global ordered window found")
    // VERDICT r10 ask #5: the five per-stage 1-row reduces are
    // consolidated — one task-grain pool aggregate + one shared
    // pass@1/majority-vote reduce
    val singles = p.split("\n").count(_.contains("Exchange SinglePartition"))
    assert(singles <= 2, s"$singles single-partition exchanges (want <=2)")
  }

  test("q_length_bias: pair join keyed on orderkey, bucket-grain agg, " +
    "no cartesian") {
    val p = plan("q_length_bias")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the self-join must be KEYED on orderkey — broadcast at plan-spec
    // scale, shuffle hash at corpus scale; either way never a loop join
    assert(p.contains("BroadcastHashJoin [ok") ||
      p.contains("hashpartitioning(ok"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(p.contains("partial_sum"), p.take(1500))
  }

  test("q_anova, q_mcnemar, q_krippendorff: one scan each, conditional " +
    "partial sums, no cartesian") {
    for (q <- Seq("q_anova", "q_mcnemar", "q_krippendorff",
      "q_cochran_q", "q_mannwhitney", "q_welch_t")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(800)}")
      assert(p.split("FileScan").length - 1 == 1, s"$q: one scan")
      assert(p.contains("partial_sum"), s"$q: ${p.take(800)}")
    }
  }

  test("q_spearman: rank maps broadcast onto the fact — ranks never " +
    "sort the corpus") {
    val p = plan("q_spearman")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "rank maps must broadcast")
    assert(p.contains("partial_sum"), p.take(1500))
  }

  test("q_tpch_q2: min-cost-per-part joins back as a broadcast; dims " +
    "broadcast; top-100 is TakeOrderedAndProject") {
    val p = plan("q_tpch_q2")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!p.contains("SortMergeJoin"),
      "every join (dims + min-cost join-back) must broadcast")
  }

  test("q_tpch_q11: part-grain agg is the only corpus shuffle; 1-row " +
    "total broadcasts back; no cartesian") {
    val p = plan("q_tpch_q11")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("partial_sum"), p.take(1500))
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("q_tpch_q20: semi-join chain — part filter broadcast, supplier " +
    "screen is a LeftSemi, no cartesian") {
    val p = plan("q_tpch_q20")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(p.replaceAll("\n", " ")
      .matches(".*PushedFilters[^\\]]*l_shipdate.*"), "date not pushed")
  }

  test("q_tpch_q16_ps: spec-form over the ps twin — anti join screen " +
    "broadcast, no cartesian") {
    val p = plan("q_tpch_q16_ps")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("LeftAnti"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q_kendall_tau: pair counting on the memoized grid — NO fact " +
    "scan in the plan, no cartesian") {
    val p = plan("q_kendall_tau")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // the grid is a checkpointed RDD: the corpus is never rescanned by
    // the O(grid^2) pair join
    assert(p.split("FileScan").length - 1 == 0,
      "pair counting must run on the checkpointed grid, not the fact")
  }

  test("q_kruskal_wallis: one lineitem scan, partial conditional sums, " +
    "value-grain window only") {
    val p = plan("q_kruskal_wallis")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.split("FileScan").length - 1 == 1, "one lineitem scan")
    assert(p.contains("partial_sum"), p.take(1500))
  }

  test("q_kaplan_meier: day-table windows, broadcast factor array, " +
    "no cartesian") {
    val p = plan("q_kaplan_meier")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("partial_min") || p.contains("partial_max"),
      p.take(1500))
  }

  test("q_friedman: one events scan, block-partitioned rank windows, " +
    "no cartesian") {
    val p = plan("q_friedman")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.split("FileScan").length - 1 == 1, "one events scan")
    assert(p.contains("hashpartitioning(user_id"), p.take(3000))
  }

  test("q_t_closeness: bounded class/band aggregates, broadcast " +
    "margins, top-10 via TakeOrderedAndProject") {
    val p = plan("q_t_closeness")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      p.take(1500))
  }

  test("q_mrr: fixed probe panel broadcast onto the corpus; best-hit " +
    "table broadcasts back; no sort-merge join") {
    val p = plan("q_mrr")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "probe-sized tables must broadcast")
  }

  test("round-11 stats family: one scan each, conditional partial " +
    "sums, no cartesian") {
    for (q <- Seq("q_cohens_d", "q_did", "q_experiment_report",
      "q_tukey_hsd")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(800)}")
      assert(p.split("FileScan").length - 1 == 1, s"$q: one scan")
      assert(p.contains("partial_sum"), s"$q: ${p.take(800)}")
    }
    // q_brier / q_log_loss carry the documented second scan for the
    // broadcast 1-row min/max bounds (the q_calibration_ece shape)
    for (q <- Seq("q_brier", "q_log_loss")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(800)}")
      assert(p.split("FileScan").length - 1 == 2,
        s"$q: main scan + bounds scan")
    }
  }

  test("q_stump: one doc scan to the value grain, pruned to the two " +
    "needed columns") {
    val p = plan("q_stump")
    assert(p.split("FileScan").length - 1 == 1, "one scan")
    assert(p.contains("ReadSchema: struct<lang:string,n_chars:bigint>"),
      p.take(800))
  }

  test("no UDFs anywhere in the verified query plans") {
    SparkEntry.queries.keys.foreach { q =>
      val p = plan(q)
      assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
        s"$q contains a UDF node")
    }
  }
}
