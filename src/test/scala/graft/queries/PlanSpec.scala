package graft.queries

import graft.SparkSpec

/** Locks in the physical-plan properties the 100 TB design depends on —
  * a regression here is invisible to the correctness oracle (same rows,
  * 100x the shuffle) so it must be pinned by plan inspection.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("filters reach the parquet scan (pushdown)") {
    val p = plan("filter_like")
    assert(p.contains("PushedFilters:"), p.take(500))
    assert(p.contains("StringContains") || p.contains("StringStartsWith"), p.take(2000))
  }

  test("projection prunes the scan schema") {
    val p = plan("scan_project")
    // events has props; the projection does not read it
    assert(p.contains("ReadSchema"))
    assert(!p.contains("props"), "scan reads pruned column 'props'")
  }

  test("dimension joins broadcast (no sort-merge for small sides)") {
    val p = plan("join_alias_lookup")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "dimension join fell back to sort-merge")
  }

  test("anti-join builds on the small side") {
    val p = plan("join_anti_new")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(2000))
  }

  test("brute-force cosine broadcasts the query set, not the corpus") {
    val p = plan("sim_bruteforce_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
  }

  test("topk_users is a partial top-k, not a global window") {
    val p = plan("topk_users")
    // sort+limit must fuse to TakeOrderedAndProject (per-partition partial
    // top-k); the rank window then sees only the k survivors, so no Window
    // node may appear below the TakeOrderedAndProject (i.e. over the full
    // aggregate).
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    val windowIdx = p.indexOf("Window")
    val topIdx = p.indexOf("TakeOrderedAndProject")
    assert(windowIdx < topIdx,
      "Window runs below TakeOrderedAndProject — global single-task sort")
  }

  test("ngram jaccard verifies LSH candidates, not all-pairs blocks") {
    // candidate generation (band_hash self-join) now lives behind the
    // session-shared CandidateArtifacts checkpoint — pin its shape on the
    // generator itself, and pin that the consuming query reads the
    // checkpoint instead of re-pairing
    val gen = graft.dedup.DedupQueries
      .minhashCandidatePairs(Tables.documents(spark, dir))
      .queryExecution.executedPlan.toString
    assert(gen.contains("band_hash"), gen.take(2000))
    assert(!gen.contains("lang"), "jaccard pair join regressed to lang/source blocking")
    val p = plan("dedup_ngram_jaccard")
    assert(p.contains("Scan ExistingRDD"),
      "ngram jaccard no longer reads the checkpointed candidate artifact")
    assert(!p.contains("minhash_sig"),
      "ngram jaccard re-runs the signature pass instead of reusing the artifact")
  }

  test("tfidf: only the 1-row total broadcasts; vocabulary side unhinted") {
    val q = graft.SparkEntry.queries("text_tfidf")(spark, dir)
    // the 1-row corpus-count frame carries an explicit broadcast hint
    // (every scalar-total site does); the vocabulary-sized document-
    // frequency side must NOT (AQE may still choose broadcast from
    // observed size at small SF — that's fine; a forced hint at 100 TB
    // is not)
    val hinted = q.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hinted.nonEmpty, "text_tfidf lost its 1-row total broadcast hint")
    assert(hinted.forall(_.child.maxRows.exists(_ <= 1L)),
      "a vocabulary-sized side carries a forced broadcast hint")
  }

  test("tokenizer_coverage: the 1-row total broadcasts, nothing else is hinted") {
    val q = graft.SparkEntry.queries("tokenizer_coverage")(spark, dir)
    val hinted = q.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hinted.nonEmpty, "tokenizer_coverage lost its 1-row total broadcast hint")
    assert(hinted.forall(_.child.maxRows.exists(_ <= 1L)),
      "a vocabulary-sized side carries a forced broadcast hint")
  }

  test("vocab_topk is a partial top-k over partial-agg counts") {
    val p = plan("vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.indexOf("Window") < p.indexOf("TakeOrderedAndProject"),
      "rank window below the top-k — global single-task sort")
  }

  test("pack_sequences windows per shard, never globally") {
    val q = graft.SparkEntry.queries("pack_sequences")(spark, dir)
    // inspect the optimized logical plan: under AQE the executed plan is an
    // AdaptiveSparkPlanExec wrapper whose collect() doesn't descend
    val windows = q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "unpartitioned window — the whole corpus would stream through one task")
  }

  test("sample_hash filter needs no shuffle") {
    val p = plan("sample_hash")
    assert(!p.contains("Exchange"),
      "hash sampling introduced a shuffle — it must ride the scan")
  }

  test("contamination_check: interpreted gram chain stays behind the checkpoint") {
    val p = plan("contamination_check")
    // the tokenize→5-gram transform must be materialized once (LogicalRDD),
    // never inlined into scan-level DataFilters by InferFiltersFromGenerate
    // (measured 46x slower: the whole corpus gram pass on one core)
    assert(p.contains("LogicalRDD") || p.contains("Scan ExistingRDD"), p.take(1000))
    assert(!p.contains("transform("),
      "gram transform re-inlined above/below the checkpoint")
  }

  test("cluster_kmeans assigns via a literal-fold projection, not a window") {
    val q = graft.SparkEntry.queries("cluster_kmeans")(spark, dir)
    val windows = q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty,
      "k-means argmin regressed to a row_number window (shuffles k*n rows)")
    // r13: the argmin is least(struct(sqdist, cid), ...) over the k
    // centroids inlined as literals — ONE codegen'd projection over the
    // scan; any join or aggregate here means the crossJoin×k + sort-agg
    // shape (which shuffled and sorted k·n rows per pass) came back
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("least(struct(dist, sqdist_ordered("),
      "centroid argmin is not the inlined least(struct(sqdist...)) fold")
    assert(!p.contains("Exchange") && !p.contains("SortAggregate"),
      "k-means assignment reintroduced a shuffle/sort-aggregate")
  }

  test("sim_ann_multiprobe explodes probes only on the query side") {
    val q = graft.SparkEntry.queries("sim_ann_multiprobe")(spark, dir)
    val gens = q.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.size == 1,
      s"expected exactly one probe explode (query side), got ${gens.size}")
  }

  test("sample_domain_mix joins thresholds via broadcast") {
    val p = plan("sample_domain_mix")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "per-lang threshold join fell back to sort-merge (corpus reshuffle)")
  }

  test("dedup_lines: one doc-level aggregation over flagged, materialized chunks") {
    val p = plan("dedup_lines")
    assert(!p.contains("transform("),
      "chunking re-inlined instead of using the checkpointed chunk table")
    // totals + kept + reassembly fuse into ONE doc_id aggregation after
    // the dup-flag join; a second doc_id exchange means the old
    // two-groupBy-plus-join shape crept back
    val docAggs = p.linesIterator.count(l =>
      l.contains("hashpartitioning(doc_id") || l.contains("hashpartitioning(doc_id#"))
    assert(docAggs <= 1, s"$docAggs doc_id exchanges — totals/kept split again:\n${p.take(2000)}")
  }

  test("text_unigram_nll has no forced vocabulary broadcast") {
    val q = graft.SparkEntry.queries("text_unigram_nll")(spark, dir)
    // the token-frequency side is vocabulary-sized at web scale — only the
    // one-row total may carry a broadcast hint (same rule as text_tfidf)
    val hinted = q.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hinted.forall(_.child.maxRows.exists(_ <= 1L)),
      "a vocabulary-sized side carries a forced broadcast hint")
  }

  test("text_bm25 ranks via partial top-k; only query-bounded sides broadcast") {
    val q = graft.SparkEntry.queries("text_bm25")(spark, dir)
    val p = q.queryExecution.executedPlan.toString
    // sort+limit on the BIGINT total fuses to TakeOrderedAndProject; the
    // rank window sees only the 10 survivors
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.indexOf("Window") < p.indexOf("TakeOrderedAndProject"),
      "rank window below the top-k — global single-task sort")
    // both broadcast hints cover frames bounded by the QUERY (per-term df,
    // one-row corpus stats) — never a corpus- or vocabulary-sized side.
    // The hinted subtrees must sit above the term IN filter.
    val logical = q.queryExecution.analyzed.toString
    assert(logical.contains("ResolvedHint"), "query-bounded sides lost their broadcast")
  }

  test("text_entropy is scan + bounded aggregates — no join, no window") {
    val q = graft.SparkEntry.queries("text_entropy")(spark, dir)
    val joins = q.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    val windows = q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(joins.isEmpty, "entropy picked up a join — it must be pure agg")
    assert(windows.isEmpty, "entropy picked up a window")
  }

  test("multimodal_resize rides the scan with no shuffle") {
    val p = plan("multimodal_resize")
    assert(!p.contains("Exchange"),
      "per-partition resize introduced a shuffle")
  }

  test("sample_temperature joins thresholds via broadcast, no corpus shuffle") {
    val p = plan("sample_temperature")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "per-lang temperature-threshold join fell back to sort-merge")
  }

  test("sample_importance: only bounded sides broadcast; top-50 is a partial top-k") {
    val q = graft.SparkEntry.queries("sample_importance")(spark, dir)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.indexOf("Window") < p.indexOf("TakeOrderedAndProject"),
      "rank window below the top-k — global single-task sort")
    // broadcast hints must cover only provably bounded frames (the 100-doc
    // benchmark, the one-row totals) — never the vocabulary-sized model
    val hinted = q.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hinted.nonEmpty && hinted.forall(_.child.maxRows.exists(_ <= 100L)),
      "a vocabulary-sized side carries a forced broadcast hint")
  }

  test("minhash signatures plan has no aggregate (fused expression)") {
    // the generator itself: fused native expression, no explode/groupBy
    val gen = graft.dedup.DedupQueries
      .minhashSignaturesFull(Tables.documents(spark, dir))
      .queryExecution.executedPlan.toString
    assert(!gen.contains("HashAggregate"),
      "signature computation regressed to an aggregate")
    assert(gen.contains("minhash_sig") || gen.toLowerCase.contains("minhash"),
      gen.take(2000))
    // the registered query reads the session-shared checkpoint
    val p = plan("dedup_minhash")
    assert(p.contains("Scan ExistingRDD"),
      "dedup_minhash no longer reads the checkpointed artifact")
  }

  test("LSH family shares ONE signature/candidate artifact (no per-query rebuild)") {
    val family = Seq("dedup_minhash", "dedup_minhash_pairs", "dedup_ngram_jaccard",
      "dedup_minhash_est", "text_edit_distance", "eval_bleu", "eval_rouge_n",
      "dedup_incremental", "contamination_fuzzy")
    val before = graft.dedup.CandidateArtifacts.buildCount
    val plans = family.map(n => n ->
      graft.SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString)
    val after = graft.dedup.CandidateArtifacts.buildCount
    assert(after - before <= 1,
      s"artifact rebuilt ${after - before} times across the family")
    // no family member re-runs the signature expression in its own plan
    plans.foreach { case (n, p) =>
      assert(!p.contains("minhash_sig"),
        s"$n re-computes minhash signatures instead of reading the artifact")
    }
  }

  test("graph family shares ONE edge/degree artifact set (no per-query rebuild)") {
    val family = Seq("identity_components", "identity_graph_stats",
      "graph_pagerank", "graph_label_propagation", "graph_modularity",
      "graph_kcore", "graph_assortativity", "graph_degree_dist",
      "graph_triangles")
    val before = graft.identity.GraphArtifacts.buildCount
    val plans = family.map(n => n ->
      graft.SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString)
    val after = graft.identity.GraphArtifacts.buildCount
    // four artifacts exist (fwd, und, deg, coPairs) — each built at most once
    assert(after - before <= 4,
      s"graph artifacts rebuilt ${after - before} times across the family")
    // no family member re-derives the signup edge list from the events
    // scan in its own plan: the edge artifact is a checkpointed RDD
    plans.filterNot(_._1 == "graph_triangles").foreach { case (n, p) =>
      assert(p.contains("Scan ExistingRDD"),
        s"$n no longer reads the checkpointed graph artifact")
      assert(!p.contains("get_json_object"),
        s"$n re-derives signup edges from events instead of the artifact")
    }
  }

  test("triangles + clustering coeff share ONE closure artifact") {
    val before = GraphBpeQueries.coClosureBuildCount
    val pTri = graft.SparkEntry.queries("graph_triangles")(spark, dir)
      .queryExecution.executedPlan.toString
    val pCc = graft.SparkEntry.queries("graph_clustering_coeff")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(GraphBpeQueries.coClosureBuildCount - before <= 1,
      "co-purchase triangle closure rebuilt across the pair")
    // both consumers read the checkpointed closed-triangle frame; the
    // orientation/wedge machinery (xxhash64 edge keys, the bloom probe)
    // must not reappear in their own plans
    Seq("graph_triangles" -> pTri, "graph_clustering_coeff" -> pCc)
      .foreach { case (n, p) =>
        assert(p.contains("Scan ExistingRDD"),
          s"$n no longer reads the checkpointed closure artifact")
        assert(!p.contains("xxhash64"),
          s"$n re-runs the wedge-closure kernel instead of the artifact")
      }
  }

  test("common-neighbors + adamic-adar share ONE link-prediction graph") {
    val before = GraphBpeQueries.cnGraphBuildCount
    val pCn = graft.SparkEntry.queries("graph_common_neighbors")(spark, dir)
      .queryExecution.executedPlan.toString
    val pAa = graft.SparkEntry.queries("graph_adamic_adar")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(GraphBpeQueries.cnGraphBuildCount - before <= 1,
      "link-prediction graph rebuilt across the pair")
    // both consumers read the checkpointed pair/degree frames; neither
    // re-runs the lineitem self-join in its own plan
    Seq("graph_common_neighbors" -> pCn, "graph_adamic_adar" -> pAa)
      .foreach { case (n, p) =>
        assert(p.contains("Scan ExistingRDD"),
          s"$n no longer reads the checkpointed cnGraph artifact")
        assert(!p.contains("l_orderkey"),
          s"$n re-derives co-purchase pairs from lineitem")
      }
  }

  test("text family shares ONE tokenize artifact (no per-query re-tokenize)") {
    val family = Seq("text_tokens", "text_tfidf", "text_bm25",
      "text_unigram_nll", "text_bigram_nll", "text_lexical_diversity",
      "vocab_topk", "sample_importance", "quality_logreg",
      "tokenizer_coverage", "sketch_countmin", "index_inverted",
      "index_incremental", "bpe_merge_topk", "bpe_encode")
    val before = graft.text.TextArtifacts.buildCount
    val plans = family.map(n => n ->
      graft.SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString)
    val after = graft.text.TextArtifacts.buildCount
    // two artifacts exist (wordCounts, vocab) — each built at most once
    assert(after - before <= 2,
      s"text artifacts rebuilt ${after - before} times across the family")
    // no family member re-runs the tokenize expression in its own plan
    // (text_bm25 keeps word_ngrams for its per-row doc-length column;
    // text_bigram_nll keeps its own n=2 stream)
    plans.filterNot(p => Set("text_bm25", "text_bigram_nll")(p._1))
      .foreach { case (n, p) =>
        assert(!p.contains("word_ngrams"),
          s"$n re-tokenizes instead of reading the shared artifact")
        assert(p.contains("Scan ExistingRDD"),
          s"$n no longer reads the checkpointed tokenize artifact")
      }
  }

  test("unigram train→apply pair shares ONE trained segmentation") {
    // VERDICT r08 task 6: tokenizer_fertility re-derived the two-round
    // EM train (~6 s isolated at sf0.1) on every run; the trained
    // segmentation is now a session artifact shared with
    // tokenizer_unigram_r2 (bench line `uni_round2`).
    GraphBpeQueries.uniRound2Invalidate()
    val before = GraphBpeQueries.uniRound2BuildCount
    val pR2 = graft.SparkEntry.queries("tokenizer_unigram_r2")(spark, dir)
      .queryExecution.executedPlan.toString
    val pFert = graft.SparkEntry.queries("tokenizer_fertility")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(GraphBpeQueries.uniRound2BuildCount - before <= 1,
      "trained unigram segmentation rebuilt across the train→apply pair")
    Seq("tokenizer_unigram_r2" -> pR2, "tokenizer_fertility" -> pFert)
      .foreach { case (n, p) =>
        assert(p.contains("Scan ExistingRDD"),
          s"$n no longer reads the checkpointed trained segmentation")
      }
  }

  test("event_transitions window is per-user, never a global sort") {
    val p = plan("event_transitions")
    val windowLine = p.linesIterator.find(_.contains("Window ")).getOrElse("")
    assert(windowLine.nonEmpty, p.take(2000))
    assert(windowLine.contains("user_id"),
      s"lag window lost its user_id partitioning: $windowLine")
  }

  test("dedup_substring shuffles 8-byte gram hashes, not gram text") {
    val p = plan("dedup_substring")
    // the corpus-wide frequency exchange must partition on the xxhash64
    // key `gh` — a text-keyed exchange would ship ~50-byte grams instead
    assert(p.contains("hashpartitioning(gh"),
      "frequency shuffle no longer keyed on the gram hash")
    // the checkpointed gram frame must carry only (doc_id, gh) — hashing
    // after the checkpoint would materialize and ship the gram text
    val rdd = p.linesIterator.find(_.contains("Scan ExistingRDD")).getOrElse("")
    assert(rdd.contains("doc_id") && rdd.contains("gh") && !rdd.contains("gram"),
      s"checkpoint no longer hash-only: $rdd")
    // every per-doc measure derives from the checkpointed hashes — a
    // `word_ngrams` in the executed plan means a second tokenize pass
    // over the corpus crept back in
    assert(!p.contains("word_ngrams"),
      "totals re-tokenize the corpus instead of counting checkpointed hashes")
  }

  test("join_bloom_pruned probes the bloom bits before the join shuffle") {
    val p = plan("join_bloom_pruned")
    // the native membership probe must sit in a Filter on the fact scan
    // side — below the join — so non-matching rows die pre-shuffle
    val filterIdx = p.indexOf("bloom_might_contain")
    val joinIdx = p.indexOf("Join")
    assert(filterIdx >= 0, "bloom probe missing from the physical plan")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      "bloom filter is not below the join in the plan tree")
  }

  test("zorder_layout is projection + one partial aggregate — no sort, no window") {
    val p = plan("zorder_layout")
    assert(!p.contains("Sort"), "zorder audit sorts — the layout key needs none")
    assert(!p.contains("Window"), "zorder audit grew a window")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      p.take(2000))
  }

  test("histogram_equidepth broadcasts boundaries, never sorts the stream") {
    val p = plan("histogram_equidepth")
    assert(p.contains("BroadcastHashJoin"),
      "quartile boundaries no longer broadcast back onto the stream")
    assert(!p.contains("Window"),
      "equi-depth bucketing regressed to an ntile window (single task per group)")
  }

  test("winnowing rollup is pure map-side array math — no window, no exchange") {
    val p = plan("dedup_winnow_fp")
    assert(p.contains("winnow_fps"),
      s"native winnow_fps expression fell out of the plan: ${p.take(1000)}")
    assert(!p.contains("Window"),
      "winnowing regressed to a per-doc window (shuffles every gram hash)")
    // Tables.spread's round-robin fan-out is the only exchange allowed;
    // a hash exchange would mean a groupBy/window crept back in
    assert(!p.contains("hashpartitioning"),
      "winnowing rollup gained a hash exchange — it is computable per input row")
  }

  test("text_novelty never joins the gram frame back onto its frequency table") {
    val p = plan("text_novelty")
    // the df=1-owner rewrite: per-doc novelty comes from a second small
    // aggregate over the frequency rows; a join keyed on the gram string
    // means the corpus-sized gram frame re-shuffled (the 11 s regression)
    val gramJoins = p.linesIterator.filter(l =>
      l.contains("Join") && l.contains("gram#")).toSeq
    assert(gramJoins.isEmpty, s"gram-keyed join crept back: $gramJoins")
  }

  test("dedup_substring never joins the gram-hash frame back onto its frequency table") {
    val p = plan("dedup_substring")
    val ghJoins = p.linesIterator.filter(l =>
      l.contains("Join") && l.contains("gh#")).toSeq
    assert(ghJoins.isEmpty, s"gram-hash-keyed join crept back: $ghJoins")
  }

  test("the triangle closure kernel bloom-prunes the wedge stream before the closure exchange") {
    // graph_triangles / graph_clustering_coeff consume the checkpointed
    // closure artifact, so the kernel's plan shape is pinned at the
    // BUILD: the closed-triangle frame as triangleClosure constructs it
    val (_, closed, _) = GraphBpeQueries.triangleClosure(
      graft.identity.GraphArtifacts.coPairs(spark, dir),
      pairsCheckpointed = true)
    val p = closed.queryExecution.executedPlan.toString
    assert(p.contains("bloom_might_contain"),
      "wedge stream lost its bloom prune — the closure join shuffles every wedge")
    // both the wedge self-join and the closure join should hash, not sort,
    // their edge-list build sides (shuffle_hash hints)
    assert(!p.contains("SortMergeJoin"),
      "triangle joins regressed to sort-merge — the wedge stream gets sorted")
  }

  test("profile_table scans one pruned column per branch, never an expanded fat row") {
    val p = plan("profile_table")
    val scans = p.linesIterator.filter(_.contains("ReadSchema: struct<")).toSeq
    assert(scans.size == 4, s"expected 4 single-column scans, got ${scans.size}")
    // each branch's scan reads exactly one column (no comma in the struct)
    assert(scans.forall(l => !l.substring(l.indexOf("struct<")).contains(",")),
      s"a profile branch reads more than its own column: $scans")
  }

  test("join_multiway_revenue: every dimension hop broadcasts; facts meet at most once off-broadcast") {
    val p = plan("join_multiway_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    val offBroadcast = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(offBroadcast <= 1,
      s"$offBroadcast shuffle-side joins — dimension hop fell off broadcast")
  }

  test("graph_pagerank iterates over the materialized edge list, not re-scanned events") {
    val p = plan("graph_pagerank")
    // both Jacobi rounds read the localCheckpoint; a parquet events scan
    // in the executed plan means an iteration re-derives the edge list
    assert(!p.contains("Scan parquet"),
      "an iteration re-scans events instead of reusing the checkpointed edges")
    assert(p.contains("Scan ExistingRDD"), p.take(1000))
    assert(!p.contains("Window"), "pagerank picked up a window — ranks are pure aggregates")
  }

  test("bpe_merge_topk ranks via partial top-k over the vocabulary") {
    val p = plan("bpe_merge_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.indexOf("Window") < p.indexOf("TakeOrderedAndProject"),
      "rank window below the top-k — global sort of the pair table")
  }

  test("window_rolling_stats RANGE frame partitions per user, never globally") {
    val p = plan("window_rolling_stats")
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty, p.take(1000))
    assert(winLines.forall(_.contains("user_id")),
      s"rolling window lost its user_id partitioning (global sort): $winLines")
  }

  test("cdc_scd2 windows partition per user; change filter precedes the lead window") {
    val p = plan("cdc_scd2")
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty, p.take(1000))
    assert(winLines.forall(_.contains("user_id")),
      s"SCD2 window lost its user_id partitioning: $winLines")
  }

  test("join_interval_overlap: exploded promo buckets broadcast to the activity side") {
    val p = plan("join_interval_overlap")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "interval overlap planned as a cross product — bucketing broke")
  }

  test("gopher rules and readability ride the scan (no exchange at all)") {
    for (name <- Seq("quality_gopher_rules", "text_readability")) {
      val p = plan(name)
      assert(!p.contains("Exchange"),
        s"$name shuffles — per-row rule math should ride the scan:\n${p.take(1000)}")
    }
  }

  test("quality_logreg is explode + one partial aggregate, no model-table join") {
    val p = plan("quality_logreg")
    assert(!p.contains("Join"), "logreg picked up a model join — weights left the expression")
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p.take(1000))
  }

  test("multimodal_phash bands join off the checkpointed hashes (one hash pass)") {
    val p = plan("multimodal_phash")
    // both band-join sides and the verify read the checkpoint; an md5 in
    // the executed plan means a side re-derives the perceptual hash
    assert(!p.contains("md5"), "a band side re-derives the payload hash")
    assert(p.contains("Scan ExistingRDD"), p.take(1000))
  }

  test("dedup_winnow_pairs joins off the checkpointed fingerprints (one tokenize pass)") {
    val p = plan("dedup_winnow_pairs")
    // both self-join sides and the df keep-list read the checkpoint — a
    // word_ngrams node in the executed plan means the corpus tokenizes
    // again per side
    assert(!p.contains("word_ngrams"),
      "pair-join sides re-tokenize instead of reusing the checkpoint")
    assert(p.contains("Scan ExistingRDD"), p.take(1000))
  }

  test("mine_bitext: Aggregator k-NN means; only the best-mate window remains, per-vector") {
    val p = plan("mine_bitext")
    // fwd/bwd k-NN means ride the k-bounded TopKByValue Aggregator
    // (map-side ≤ K rows/key) — a rank window there would sort the full
    // |src|×|tgt| scored frame twice
    assert(p.toLowerCase.contains("topkbyvalue"),
      "k-NN denominators regressed to rank windows over the scored frame")
    // one window may remain: the best-mate pick, partitioned per src
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(windows.nonEmpty, p.take(2000))
    windows.foreach { w =>
      assert(w.contains("src_id") || w.contains("tgt_id"),
        s"window lost its per-vector partitioning: $w")
    }
    // dot-product scoring happened before the checkpoint — the downstream
    // plan must consume scored cosines, never re-run the embedding fold
    assert(!p.contains("dot_ordered"),
      "margin math re-derives cosines instead of reading the checkpoint")
  }

  test("text_novelty: gram-keyed df agg + doc rollup, no self-join, no window") {
    val p = plan("text_novelty")
    // the novelty join is grams ⋈ its own aggregate off the checkpoint —
    // never a corpus × corpus pair join, never a rank window
    assert(!p.contains("windowspecdefinition"), "novelty grew a window")
    assert(!p.contains("CartesianProduct"), "novelty grew a cross join")
    assert(p.contains("Scan ExistingRDD"), p.take(1000))
    // one tokenize feeding the checkpoint; the executed plan re-tokenizing
    // means a side stopped reading it
    assert(!p.contains("word_ngrams"),
      "a novelty side re-tokenizes instead of reusing the checkpointed grams")
  }

  test("graph_kcore result is a pure aggregate over the converged edge checkpoint") {
    val p = plan("graph_kcore")
    assert(p.contains("Scan ExistingRDD"), p.take(1000))
    assert(!p.contains("windowspecdefinition") && !p.contains("SortMergeJoin"),
      "k-core output re-plans peeling work instead of aggregating the fixpoint")
  }

  test("mine_hard_negatives: broadcast query set, Aggregator top-k, no rank window") {
    val p = plan("mine_hard_negatives")
    // the bounded query set and the |Q|-row best-positive frame broadcast;
    // the corpus side never shuffles on a data key
    assert(p.contains("BroadcastExchange"), p.take(2000))
    // per-query top-k goes through the k-bounded Aggregator, not a
    // row_number window over the full scored frame
    assert(!p.contains("windowspecdefinition"),
      "hard negatives regressed to a rank window over every scored row")
    // the q <> a scoring join is broadcast-nested-loop by design (tiny
    // broadcast side); a CartesianProduct would mean the broadcast was lost
    assert(!p.contains("CartesianProduct"), "scoring join degenerated to a cartesian")
    assert(p.toLowerCase.contains("topkbyvalue"),
      "per-query top-k no longer uses the k-bounded Aggregator")
  }

  test("cdc_log_compact: map-side-combined argmax; any sort is partition-local") {
    val p = plan("cdc_log_compact")
    assert(!p.contains("windowspecdefinition"),
      "compaction regressed to a row_number window over the full log")
    // partial_max before the exchange = the shuffle carries one candidate
    // per (key × partition), not the log
    assert(p.contains("partial_max"), p.take(2000))
    // struct-max plans SortAggregate; every Sort it inserts must be
    // partition-local (global=false) — a global sort would be a second,
    // all-data exchange
    p.linesIterator.filter(_.trim.startsWith("Sort ")).foreach { l =>
      assert(l.contains("], false, 0"), s"compaction grew a GLOBAL sort: $l")
    }
  }

  test("dedup_keep_best: map-side-combined argmax over cluster assignments, no window") {
    val p = plan("dedup_keep_best")
    assert(!p.contains("windowspecdefinition"),
      "keep-best regressed to a rank window over the clustered corpus")
    // partial_max before the exchange = the shuffle carries one best-doc
    // candidate per (cluster × partition), not every member row
    assert(p.contains("partial_max") || p.contains("partial max"), p.take(2000))
  }

  test("graph_common_neighbors: windowed scan pushdown + partial top-k, no rank window") {
    val p = plan("graph_common_neighbors")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 lost the per-partition partial top-k")
    assert(!p.contains("windowspecdefinition"), "link prediction grew a rank window")
    assert(!p.contains("CartesianProduct"), "wedge join degenerated to a cartesian")
    // the 12-month recency window must reach the lineitem scan — it is
    // what keeps the wedge stage linear as history accumulates. The
    // executed plan starts at the checkpointed pair list (the scan ran at
    // construction time), so pin pushdown on the scan expression itself.
    val scan = graft.queries.Tables.lineitem(spark, dir)
      .where("l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' " +
        "AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'")
      .select("l_orderkey", "l_partkey")
      .queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters:") && scan.contains("l_shipdate"),
      scan.take(2000))
  }

  test("sql_text_parity: the SQL-text gateway plans like the DataFrame API") {
    val p = plan("sql_text_parity")
    // same Catalyst machinery: date filter pushes to the orders scan,
    // customer dim broadcasts — no sort-merge, no window
    assert(p.contains("PushedFilters:") && p.contains("o_orderdate"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "SQL-text join fell back to sort-merge")
  }

  test("experiment_ttest: the t math sees aggregates only — no window, no sort") {
    val p = plan("experiment_ttest")
    assert(!p.contains("windowspecdefinition"), "t-test grew a window")
    // the type cross is a broadcast of a ~5-row frame, never a shuffle
    // exchange keyed by event_type on the user list
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(2000))
    // no global Sort node anywhere — output is one row per event type
    assert(!p.linesIterator.exists(l => l.trim.startsWith("Sort ") &&
      !l.contains("SortMergeJoin")), "t-test grew a global sort")
  }

  test("dedup_lines assembles cleaned text in place — chunk text never shuffles") {
    val p = plan("dedup_lines")
    // reassembly is an indexed array filter in a projection, not a
    // collect_list aggregate pulling every chunk string through a
    // doc_id-keyed exchange
    assert(!p.contains("collect_list(struct"),
      "line dedup regressed to collecting chunk text per doc")
    assert(p.contains("filter(chunks"), p.take(2000))
    // both hash consumers read the one checkpointed per-doc array frame
    assert(p.contains("Scan ExistingRDD"), p.take(1000))
    assert(!p.contains("word_ngrams"),
      "a dedup_lines side re-tokenizes instead of reusing the checkpoint")
  }

  test("sample_importance scores off the (doc, token) pre-aggregate, never raw occurrences") {
    val p = plan("sample_importance")
    // the token explode runs once, BEFORE the checkpoint — the scoring
    // plan re-exploding (a Generate node) means a consumer fell back to
    // occurrence-level work
    assert(!p.contains("Generate "),
      "DSIR scoring re-explodes token occurrences")
    assert(p.contains("Scan ExistingRDD"), p.take(1000))
    // the rk window is legal only OVER the 50 TakeOrdered survivors —
    // textually above the TakeOrderedAndProject (the topk_users rule)
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.indexOf("Window") < p.indexOf("TakeOrderedAndProject"),
      "DSIR rank window runs below the partial top-k")
  }

  test("bpe_encode: the merge chain is inlined codegen replaces, no merge-table join") {
    val df = graft.SparkEntry.queries("bpe_encode")(spark, dir)
    val lp = df.queryExecution.optimizedPlan
    // all 20 learned merges apply as chained replace() calls inside one
    // projection over the vocabulary — a join against a merges frame (or
    // an explode-per-merge) would re-shuffle the vocab once per merge.
    // The plan STRING truncates the nested expression, so count the
    // StringReplace nodes in the expression tree itself.
    val nReplace = lp.collect { case n =>
      n.expressions.map(_.collect {
        case e if e.getClass.getSimpleName == "StringReplace" => e
      }.size).sum
    }.sum
    assert(nReplace >= 20, s"merge chain no longer inlined ($nReplace replaces)")
    val nJoin = lp.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.size
    assert(nJoin <= 1, s"bpe_encode grew extra joins ($nJoin)")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Generate "), "bpe_encode re-explodes at scoring time")
    assert(!p.contains("windowspecdefinition"), "bpe_encode grew a rank window")
  }

  test("mine_preference_pairs: both argmaxes combine in ONE map-side aggregate") {
    val p = plan("mine_preference_pairs")
    assert(!p.contains("windowspecdefinition"),
      "preference mining regressed to a rank window over the clustered corpus")
    // max(struct) + min(struct) ride the same partial aggregate — the
    // shuffle carries two candidates per (cluster × partition), not members
    assert(p.contains("partial_max") && p.contains("partial_min"), p.take(2000))
  }

  test("corpus_drift: one conditional-sum aggregate, totals broadcast, no window") {
    val p = plan("corpus_drift")
    assert(!p.contains("windowspecdefinition"), "drift grew a rank window")
    // the per-lang totals frame (a handful of rows) joins back broadcast;
    // a sort-merge here would shuffle the vocabulary-sized count frame on
    // lang — a skew magnet (languages are few and huge)
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "drift totals join fell back to sort-merge")
    assert(!p.contains("CartesianProduct"), "drift grew a cartesian")
  }

  test("tokenizer_coverage: each top-V is a bounded partial top-k off the checkpoint") {
    val p = plan("tokenizer_coverage")
    // three TakeOrderedAndProject branches (V = 10/100/1000) — never a
    // vocabulary-wide rank window
    val nTop = p.sliding("TakeOrderedAndProject".length)
      .count(_ == "TakeOrderedAndProject")
    assert(nTop == 3, s"expected 3 bounded top-V branches, saw $nTop")
    assert(!p.contains("windowspecdefinition"), "coverage grew a rank window")
    // every branch reads the ONE checkpointed frequency aggregate; a
    // word_ngrams in the executed plan means a branch re-tokenizes
    assert(p.contains("Scan ExistingRDD"), p.take(1000))
    assert(!p.contains("word_ngrams"), "a coverage branch re-tokenizes the corpus")
  }

  test("web_url_normalize: shuffle-free per-row math on a pruned scan") {
    val p = plan("web_url_normalize")
    assert(!p.contains("Exchange"), "URL normalization grew a shuffle")
    // the normalizer never reads the document text — only (doc_id, source)
    assert(!p.contains("text:string"), "scan reads the unneeded text column")
  }

  test("text_html_extract: shuffle-free regex chain riding the scan") {
    val p = plan("text_html_extract")
    assert(!p.contains("Exchange"), "HTML extraction grew a shuffle")
    assert(!p.contains("windowspecdefinition"), "HTML extraction grew a window")
  }

  test("embed_rp_project: native expression, no shuffle, one generate") {
    val p = plan("embed_rp_project")
    assert(p.contains("rp_project("), "native rp_project expression missing from plan")
    assert(!p.contains("Exchange"), "random projection grew a shuffle")
    assert(!p.contains("lambdafunction"), "interpreted HOF lambdas back in the hot path")
  }

  test("web_domain_blocklist: blocklist anti-join broadcasts the list") {
    val p = plan("web_domain_blocklist")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "blocklist join shuffles the corpus")
  }

  test("sft_assemble: pairing window is shard-partitioned, never global") {
    val p = plan("sft_assemble")
    assert(p.contains("windowspecdefinition(source"),
      "lead() window lost its source partitioning — global single-task sort")
  }

  test("quality_ppl_buckets: only the two bounded frames carry broadcast hints") {
    val q = graft.SparkEntry.queries("quality_ppl_buckets")(spark, dir)
    val logical = q.queryExecution.analyzed.toString
    val hints = logical.sliding("ResolvedHint".length).count(_ == "ResolvedHint")
    // totals (#langs rows, appearing twice: in the direct scoring branch
    // and again inside the thresholds subtree) and thresholds (#langs
    // rows) — the vocabulary-sized NLL join must stay unhinted (the
    // tfidf rule), so any count above these three is a regression
    assert(hints == 3, s"expected 3 broadcast-hint nodes (totals x2, thresholds), saw $hints")
  }

  test("embed_power_pca: direction broadcasts; nothing sort-merges") {
    val p = plan("embed_power_pca")
    assert(p.contains("Broadcast"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "power iteration shuffles the corpus to join")
  }

  test("sample_reservoir: k-bounded Aggregator per stratum, no rank window") {
    val p = plan("sample_reservoir")
    assert(!p.contains("windowspecdefinition"),
      "reservoir sampling regressed to a per-stratum rank window")
    assert(p.toLowerCase.contains("topkbyvalue"),
      "per-stratum bottom-k no longer uses the k-bounded Aggregator")
  }

  test("eval_auc_rank: the rank-sum window reads the bounded histogram, not the corpus") {
    val p = plan("eval_auc_rank")
    // plans print top-down, so the Window node must appear ABOVE (before)
    // the (lang, bucket) histogram aggregate feeding it — if the window
    // ever consumed per-document rows the corpus would sort per lang
    val widx = p.indexOf("Window")
    assert(widx >= 0, p.take(2000))
    val below = p.substring(widx)
    assert(below.contains("HashAggregate") && below.contains("bucket"),
      "AUC window no longer consumes the bucketed histogram aggregate")
    // per-doc scoring aggregate (doc_id keys) must also sit below the window
    assert(below.contains("doc_id"),
      "per-document scoring aggregate missing below the window")
  }

  test("embed_gram_cov: one Gram aggregate, explode only above it") {
    val p = plan("embed_gram_cov")
    val lower = p.toLowerCase
    assert(lower.contains("grammatrix"),
      "covariance no longer accumulates through the GramMatrix Aggregator")
    // the (i, j) pair explode must run AFTER the aggregate (printed above
    // it): exploding per vector would multiply the shuffle 2000x
    val gidx = p.indexOf("Generate")
    val aidx = p.indexOf("Aggregate")
    assert(gidx >= 0 && aidx >= 0 && gidx < aidx,
      "pair explode ran below the Gram aggregate — per-vector fan-out")
  }

  test("funnel_window: two chained native as-of merges, no windows, no cartesian") {
    val p = plan("funnel_window")
    val asofs = p.linesIterator.count(_.contains("AsOfJoin"))
    assert(asofs == 2, s"expected the two step joins as AsOfJoinExec nodes, saw $asofs")
    assert(!p.contains("windowspecdefinition"),
      "funnel regressed to per-user event windows")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "a step join exploded to a per-user cross product")
  }

  test("eval_ndcg: broadcast evaluation frames, Aggregator top-k, no rank window") {
    val p = plan("eval_ndcg")
    assert(p.contains("BroadcastExchange"), p.take(2000))
    assert(!p.contains("windowspecdefinition"),
      "NDCG top-k regressed to a rank window over every scored row")
    assert(p.toLowerCase.contains("topkbyvalue"),
      "per-query top-k no longer uses the k-bounded Aggregator")
    assert(!p.contains("CartesianProduct"), "scoring join degenerated to a cartesian")
  }

  test("index_inverted: bounded TakeOrdered term selection, broadcast back") {
    val p = plan("index_inverted")
    // term selection must be a per-partition partial top-k, never a
    // vocab-wide rank window or global sort-then-limit on one reducer
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("windowspecdefinition"),
      "term selection regressed to a vocab-wide rank window")
    // the 20-row selected-term frame joins back broadcast
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("sim_knn_graph and eval_mrr: Aggregator top-k, no rank window") {
    Seq("sim_knn_graph", "eval_mrr").foreach { n =>
      val p = plan(n)
      assert(p.toLowerCase.contains("topkbyvalue"),
        s"$n no longer uses the k-bounded Aggregator")
      assert(!p.contains("windowspecdefinition"),
        s"$n regressed to a rank window over every scored row")
    }
  }

  test("eval_bleu: one tokenize pass behind the checkpoint; clipped match is a merge, not a re-aggregate") {
    val p = plan("eval_bleu")
    // per-doc gram tables build ONCE at checkpoint construction — a
    // word_gram_hash_counts in the executed plan means a side re-tokenizes
    assert(!p.contains("word_gram_hash_counts"),
      "a bleu side re-tokenizes instead of reading the checkpointed gram tables")
    assert(p.contains("Scan ExistingRDD"), p.take(1000))
    // m1/m2 are per-pair sorted merges — the old shape pushed
    // |pairs|×|grams| rows through a join + groupBy(a, b) re-aggregate
    assert(p.contains("sorted_summin"),
      "clipped-match counts no longer use the sorted-merge kernel")
    assert(!p.contains("windowspecdefinition"), "bleu grew a rank window")
    val pairAggs = p.linesIterator.count(l =>
      l.contains("hashpartitioning(a#") || l.contains("hashpartitioning(b#"))
    assert(pairAggs == 0,
      s"bleu re-aggregates per pair again ($pairAggs pair-keyed exchanges)")
  }

  test("est + jaccard: exact intersections are sorted merges, not per-pair hash sets") {
    for (name <- Seq("dedup_minhash_est", "dedup_ngram_jaccard")) {
      val p = plan(name)
      assert(p.contains("sorted_intersect_count"),
        s"$name lost the sorted-merge intersection kernel")
      assert(!p.contains("array_intersect"),
        s"$name regressed to array_intersect (per-pair hash set + array alloc)")
    }
  }

  test("dedup_minhash_est: verify joins stay equi-keyed on the pair list") {
    // band-hash pair generation and the candidate-doc semi-join run behind
    // eager localCheckpoints, so the FINAL plan only shows the verify
    // stage — assert that stage is pure hash equi-joins (the logical plan
    // pins the semi gate instead)
    val q = graft.SparkEntry.queries("dedup_minhash_est")(spark, dir)
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "estimator verify degenerated past the equi joins")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p.take(2000))
  }

  test("join_scd2_pit: equi-keyed PIT join, range as post-join predicate") {
    val p = plan("join_scd2_pit")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "PIT join lost its user_id equi key — interval cross product")
  }

  test("streak_islands: one per-user window, argmax without a second sort") {
    val p = plan("streak_islands")
    val windows = p.linesIterator.count(_.contains("windowspecdefinition"))
    assert(windows <= 2, // one Window node prints its spec twice at most
      s"streaks grew extra windows: $windows spec mentions")
    assert(p.contains("partial_") || p.contains("HashAggregate"),
      "island rollup lost partial aggregation")
  }

  test("graph_degree_dist: CCDF window runs behind the checkpoint, total broadcasts") {
    // the distribution table is eagerly checkpointed, so the FINAL plan
    // must be: scan-of-checkpoint -> broadcast 1-row total -> window —
    // no corpus-sized aggregate may appear above the checkpoint scan
    val p = plan("graph_degree_dist")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "scalar total lost its broadcast: " + p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "1-row total joined via sort-merge")
  }

  test("text_sentence_stats: scan + one lang aggregate, no join, no window") {
    val p = plan("text_sentence_stats")
    assert(!p.contains("Join"), "sentence stats grew a join")
    assert(!p.contains("Window"), "sentence stats grew a window")
    assert(p.contains("HashAggregate") && p.contains("partial_"),
      "lang rollup lost partial aggregation: " + p.take(2000))
  }

  test("text_lexical_diversity: two combine-friendly aggregates, no window") {
    val p = plan("text_lexical_diversity")
    assert(!p.contains("Window"), "lexical diversity grew a window")
    assert(!p.contains("Join"), "lexical diversity grew a join")
    assert(p.contains("partial_count") || p.contains("partial_"),
      "per-doc rollup lost partial aggregation: " + p.take(2000))
  }

  test("eval_rouge_n: verify joins stay equi-keyed on the pair list") {
    val p = plan("eval_rouge_n")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "ROUGE verify degenerated past the equi joins")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p.take(2000))
    assert(p.contains("sorted_summin"),
      "ROUGE lost the sorted-merge clipped-match kernel")
  }

  test("sim_ann_filtered probes via a broadcast composite-key hash join, never a cartesian") {
    val p = plan("sim_ann_filtered")
    // the probe list (queries × nprobe, predicate value attached) must
    // broadcast against the corpus on the COMPOSITE (cell, label) key —
    // the posting-list read that makes the predicate pushdown real, not
    // a scan-and-discard post-filter. (The bounded queries × K centroid
    // cross for probe ranking is the trained-centroid pattern and is
    // allowed — it never touches the corpus side.)
    assert("BroadcastHashJoin \\[cell#\\d+L, label#\\d+\\]".r
      .findFirstIn(p).isDefined,
      "corpus probe is not a composite (cell, label) broadcast hash join: " +
        p.take(2000))
    assert(!p.contains("CartesianProduct"),
      "filtered-ANN probe degenerated to a cartesian")
  }

  test("sim_knn_descent_r2 keeps the round body window-free on the selection path") {
    val p = plan("sim_knn_descent_r2")
    // both the forward top-3 re-select AND the capped-reverse sampling
    // must be the k-bounded TopKByValue ObjectHashAggregate — a rank
    // window in either place sorts every candidate/in-edge list through
    // a per-node exchange at corpus scale
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window "),
      "descent round-2 selection fell back to a rank window")
    assert(!p.contains("CartesianProduct"), "round-2 plan went all-pairs")
  }

  test("sim_knn_descent re-selects via the k-bounded aggregator, never a rank window") {
    // pin the BUILD pipeline, not the registered query: sim_knn_descent
    // now returns the session-shared checkpointed graph (descentR1), so
    // its own plan is a checkpoint scan — the shape under audit is the
    // artifact build's
    val emb = graft.queries.Tables.embeddings(spark, dir)
    val p = graft.sim.SimQueries.knnDescentTopK(
      graft.sim.SimQueries.knnDescentCandidates(
        graft.sim.SimQueries.knnDescentSeed(emb)), emb)
      .queryExecution.executedPlan.toString
    // per-node top-3 must be the TopKByValue ObjectHashAggregate (map-side
    // ≤ k rows per node reach the exchange); a row_number window here
    // would sort every candidate list through one exchange per node
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window "),
      "descent re-select fell back to a rank window")
    // candidate generation is id-only joins; embeddings attach at the
    // final gather — never a cartesian
    assert(!p.contains("CartesianProduct"), "descent plan went all-pairs")
  }

  test("text_bm25_swept / text_bm25_merged_served / index_delete stay index-side — no corpus scan") {
    // the delete path must run off the index alone: tombstones derive
    // from the norms sidecar (never a documents re-read), the sweep
    // decodes postings, and the merged serve reads the folded segments
    graft.text.IndexArtifacts.postings(spark, dir)
    graft.text.IndexArtifacts.norms(spark, dir)
    graft.text.IndexArtifacts.mergedPostings(spark, dir)
    graft.text.IndexArtifacts.sweptPostings(spark, dir)
    graft.text.IndexArtifacts.sweptNorms(spark, dir)
    Seq("text_bm25_swept", "text_bm25_merged_served", "index_delete",
        "text_bm25_swept_served").foreach { n =>
      val p = plan(n)
      assert(!p.contains("word_ngrams"), s"$n re-tokenizes the corpus")
      assert(!p.contains("documents.parquet"), s"$n scans the corpus")
    }
  }

  test("text_bm25_served answers from the index — no corpus scan, no re-tokenization") {
    // build the index artifacts first (session checkpoints), then audit
    // the SERVED plan: it must read only the checkpointed postings/norms
    // frames — a documents.parquet scan or a word_ngrams call here means
    // the serve path silently recomputes what the index already stores
    graft.text.IndexArtifacts.postings(spark, dir)
    graft.text.IndexArtifacts.norms(spark, dir)
    val p = plan("text_bm25_served")
    assert(!p.contains("word_ngrams"), "served plan re-tokenizes the corpus")
    assert(!p.contains("documents.parquet"), "served plan scans the corpus")
    assert(p.contains("ExistingRDD") || p.contains("Scan parquet"),
      "served plan reads neither a checkpoint nor a parquet snapshot: " + p.take(500))
  }
}
