package graft.queries

import graft.SparkSpec

/** Physical-plan audits: the scale-critical plan properties the queries
  * rely on (filter pushdown to the parquet scan, column pruning,
  * broadcast joins for dims, whole-stage codegen) asserted as tests so
  * a plan regression fails CI instead of only showing up at 100 TB.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Plan AFTER execution — AQE only materializes WholeStageCodegen
    * spans in the final adaptive plan.
    */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q6: every predicate reaches the parquet scan as a pushed filter") {
    val p = plan(Analytics.q6Filter(spark, sf0001))
    assert(p.contains("PushedFilters:"), "expected a parquet scan with pushed filters")
    Seq("l_discount", "l_quantity").foreach { c =>
      assert(p.replaceAll("\\s+", " ").matches(s"(?s).*PushedFilters: \\[[^\\]]*$c.*"),
        s"predicate on $c must be pushed to the scan:\n$p")
    }
  }

  test("q3/q5: dimension tables join via broadcast, not shuffle") {
    assert(plan(Analytics.q3Join(spark, sf0001)).contains("BroadcastHashJoin"))
    val p5 = plan(Analytics.q5MultiJoin(spark, sf0001))
    // all three dims (customer, nation, region) broadcast
    assert("BroadcastHashJoin".r.findAllIn(p5).size >= 3,
      s"q5 must broadcast its dimension tables:\n$p5")
  }

  test("dedup_exact reads only the text column it needs") {
    val p = plan(graft.dedup.Dedup.exact(spark, sf0001))
    assert(p.contains("ReadSchema"))
    assert(!p.contains("lang") && !p.contains("source"),
      s"dedup_exact must prune unused document columns:\n$p")
  }

  test("mm_metadata never reads the binary payload") {
    val p = plan(graft.multimodal.Multimodal.metadataStats(spark, sf0001))
    assert(!p.contains("payload"),
      s"metadata query must not touch the media payload column:\n$p")
  }

  // `*(n)` is the WholeStageCodegen marker in SparkPlan.toString
  private def hasCodegenSpan(p: String): Boolean = p.contains("*(")

  test("text quality scoring stays inside whole-stage codegen") {
    // regexp_count-based signals compile; one filter()/transform()
    // lambda in the projection would interpret the whole stage.
    val p = finalPlan(graft.text.TextOps.qualityScores(spark, sf0001))
    assert(hasCodegenSpan(p), s"expected codegen spans:\n$p")
    assert(!p.contains("lambdafunction"),
      s"no interpreted HOF lambdas allowed on the quality-scoring path:\n$p")
  }

  test("corpus filter scan projection stays inside whole-stage codegen") {
    val p = finalPlan(graft.text.CorpusFilter.funnel(spark, sf0001))
    assert(hasCodegenSpan(p), s"expected codegen spans:\n$p")
    assert(!p.contains("lambdafunction"),
      s"no interpreted HOF lambdas allowed in the corpus filter:\n$p")
  }

  test("q1 uses partial (map-side) aggregation") {
    val p = plan(Analytics.q1Agg(spark, sf0001))
    assert(p.contains("partial_"), s"expected partial aggregates before the shuffle:\n$p")
  }

  test("text_fingerprint: rolling hash is codegen, not an interpreted HOF fold") {
    // The Karp-Rabin fold is RollingHashExpr (custom codegen Expression);
    // the aggregate()-over-split() formulation it replaced was a
    // CodegenFallback that boxed one string per character of the corpus.
    val p = finalPlan(graft.text.TextOps.fingerprints(spark, sf0001))
    assert(hasCodegenSpan(p), s"expected codegen spans:\n$p")
    assert(!p.contains("lambdafunction"),
      s"no interpreted HOF lambdas allowed on the fingerprint path:\n$p")
    assert(p.contains("rolling_hash"), s"expected RollingHashExpr in the plan:\n$p")
  }

  test("custom expressions compile under codegen even when stacked in one stage") {
    // Regression guard: Janino compile errors (e.g. colliding local
    // names when several vector kernels inline into one stage) make
    // Spark fall back to interpreted execution SILENTLY — the query
    // stays correct and 10× slower. With codegen.fallback off, any
    // compile failure becomes a hard error here instead.
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      graft.svm.SvmQueries.centroidEvaluate(spark, sf0001).collect()
      graft.text.TextOps.fingerprints(spark, sf0001).collect()
      graft.similarity.Ivf.ivfTopK(spark, sf0001, k = 2, probeEvery = 100).collect()
      BloomJoin.qBloomJoin(spark, sf0001).collect()
    }
  }

  test("svm_evaluate: literal-centroid argmin — no window exchange, no crossJoin blow-up") {
    // The per-row argmin over 10 centroids is one codegen projection
    // (Ivf.nearestIdExpr); the crossJoin(broadcast)+row_number shape it
    // replaced shuffled 10× the corpus through a per-vector sort.
    val p = plan(graft.svm.SvmQueries.centroidEvaluate(spark, sf0001))
    assert(!p.contains("Window"), s"no window exchange allowed in svm_evaluate:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"no cross join allowed in svm_evaluate scoring pass:\n$p")
  }

  test("text_pii_scrub: the audit is one codegen scan, no interpreted lambdas") {
    // all four detectors + the sequential redaction are regexp
    // expressions in a single projection; one HOF would interpret the
    // per-document hot path of a corpus-wide scrub.
    val p = finalPlan(graft.text.Pii.piiScrub(spark, sf0001))
    assert(hasCodegenSpan(p), s"expected codegen spans:\n$p")
    assert(!p.contains("lambdafunction"),
      s"no interpreted HOF lambdas allowed on the scrub path:\n$p")
  }

  test("text_repetition: gram counting aggregates partially before the shuffle") {
    val p = plan(graft.text.Repetition.repetitionStats(spark, sf0001))
    assert(p.contains("partial_"),
      s"expected map-side partial aggregation of gram counts:\n$p")
  }

  test("corpus_mix: the rate table joins broadcast; the corpus never shuffles for it") {
    val p = plan(graft.text.CorpusMix.mix(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"),
      s"rate-table join must be broadcast:\n$p")
  }

  test("pq encode/assignment is a literal-codebook projection — no join, no shuffle") {
    val data = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    val books = graft.similarity.Pq.trainCodebooks(data, m = 8, ksub = 16, iters = 1)
    val p = plan(graft.similarity.Pq.encode(data, books))
    assert(!p.contains("Join") && !p.contains("Exchange"),
      s"PQ encoding must be a narrow map over the scan:\n$p")
  }

  test("q_range_join: interval join runs as a hash join on time buckets, not a nested loop") {
    // The whole point of the bucketization: an inequality-only join
    // would plan as BroadcastNestedLoopJoin — O(n·w) comparisons at any
    // scale. The bucket column makes it an equi hash join with the
    // interval test as a residual filter.
    val p = plan(Analytics.qRangeJoin(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), s"expected a hash join on the bucket key:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must not degrade to a nested loop:\n$p")
  }

  test("q_skew_histogram: both aggregation levels are map-side combined") {
    // Count partial HashAggregate OPERATORS, not 'partial_' substrings:
    // the histogram level alone prints three partial_ functions, so a
    // raw substring count >= 2 would stay green even if the per-key
    // level — the one that matters at scale — lost its combine.
    val p = plan(Analytics.qSkewHistogram(spark, sf0001))
    val partialAggOps = p.linesIterator
      .count(l => l.contains("HashAggregate") && l.contains("partial_"))
    assert(partialAggOps >= 2,
      s"per-key count and histogram must EACH have a partial HashAggregate:\n$p")
  }

  test("text_rare_tokens: no FORCED broadcast of the rare-token set") {
    // Zipf's law: tokens with tf <= RareMax are the LARGEST slice of a
    // natural vocabulary (billions of entries at 100 TB) — a broadcast
    // hint on that side OOMs the driver and every executor. Catalyst is
    // still free to broadcast when its SIZE ESTIMATE says the set is
    // tiny (it does at sf0.001, and AQE re-checks at runtime) — that's
    // the adaptive behavior we want. So the pin disables size-based
    // auto-broadcast: any Broadcast surviving that can only come from a
    // hard-coded hint, which is the 100 TB bug.
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p = plan(graft.text.RareTokens.rareTokenStats(spark, sf0001))
      val semiJoinLines = p.linesIterator.filter(_.contains("LeftSemi")).toSeq
      assert(semiJoinLines.nonEmpty, s"expected a LeftSemi join in the plan:\n$p")
      assert(!semiJoinLines.exists(_.contains("Broadcast")),
        s"the rare-token semi-join must not be hint-forced to broadcast:\n$p")
    }
  }

  test("dedup_substring: map-side-combined window agg, pruned scan, no pair join") {
    val p = plan(graft.dedup.Substring.substringAudit(spark, sf0001))
    assert(p.contains("partial_"),
      s"shared-window counting must partial-aggregate before the shuffle:\n$p")
    assert(!p.contains("lang") && !p.contains("source"),
      s"substring audit must prune unused document columns:\n$p")
    // the decisive scale property: flagging joins docs to WINDOWS, never
    // docs to docs — a boilerplate window must not cross-product
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"no pairwise doc join allowed in substring dedup:\n$p")
  }

  test("corpus_pack: window and shard aggregation share one shuffle") {
    // The window partitions by (lang, bucket); the following groupBy on
    // (lang, bucket, shard) is satisfied by the same hash partitioning
    // (subset rule), so the agg must NOT re-exchange. Only the window
    // shuffle and the final presentation sort may move data.
    val df = graft.text.CorpusShard.pack(spark, sf0001)
    val p = plan(df)
    val exchanges = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllIn(p).toSeq
    val hashExchanges = exchanges.count(_.contains("hashpartitioning"))
    assert(hashExchanges == 1,
      s"expected exactly one hash exchange (the window's), got $hashExchanges:\n$p")
  }

  test("q_funnel: chained step windows + row-number cut share ONE user_id shuffle") {
    // Three Window operators (t1, t2, t3) plus the rn=1 filter all
    // partition by user_id; at 100 TB the events table must move once.
    val p = plan(Funnel.qFunnel(spark, sf0001))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"expected exactly one hash exchange for the whole funnel, got $hashExchanges:\n$p")
  }

  test("q_scd2: run detection, collapse, and interval chaining share ONE user_id shuffle") {
    // lag window → running version sum → (user_id, version) aggregate
    // → lead window all cluster on user_id: HashPartitioning(user_id)
    // satisfies every later distribution, so the change log moves once.
    val p = plan(Timeline.qScd2(spark, sf0001))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"expected exactly one hash exchange for the whole SCD2 build, got $hashExchanges:\n$p")
  }

  test("q_gapfill: bucket aggregate, lead window, and gap explode share ONE shuffle — no spine join") {
    // The spine-join formulation would add a join exchange; generating
    // gap rows from the observations keeps the repartition(user_id)
    // as the only data movement.
    val p = plan(Timeline.qGapfill(spark, sf0001))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"expected exactly one hash exchange for the whole gap-fill, got $hashExchanges:\n$p")
    assert(!p.contains("Join"), s"gap-fill must not plan a spine join:\n$p")
  }

  test("q_bloom_join: membership probe filters the fact side BEFORE its shuffle") {
    // The whole point of the runtime filter is dropping fact rows
    // before the join exchange: bloom_might_contain must appear under
    // the probe-side Exchange, and the join must be the
    // dim-too-big-to-broadcast SortMergeJoin the hint requests.
    val p = plan(BloomJoin.qBloomJoin(spark, sf0001))
    assert(p.contains("SortMergeJoin"), s"expected the hinted merge join:\n$p")
    assert(p.contains("bloom_might_contain"), s"expected the bloom probe in-plan:\n$p")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(l_orderkey")
    val probeIdx = p.indexOf("bloom_might_contain")
    assert(exchangeIdx >= 0 && probeIdx > exchangeIdx,
      s"bloom probe must sit below (after, in toString order) the fact-side exchange:\n$p")
  }

  test("heavy hitters sketch pass: partial MG aggregate, no per-key shuffle") {
    // Pass 1 must move ONE aggregate row per partition (SinglePartition
    // exchange), never a hashpartitioning of the distinct keys —
    // that's the whole point of the sketch.
    import org.apache.spark.sql.functions._
    val ev = Analytics.loadEvents(spark, sf0001)
      .select(length(bin((col("event_id") % 65536L) + 1L)).cast("long").as("hk"))
    val p = plan(ev.agg(graft.functions.GraftFunctions.mg_topk(col("hk"), 8)))
    assert(p.contains("misra_gries"), s"expected the MG aggregate in-plan:\n$p")
    assert(p.contains("partial_misra_gries"),
      s"MG must aggregate partially (map-side) before the exchange:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"sketch pass must not shuffle per-key:\n$p")
  }

  test("q_retention: cohort window and cell aggregation = two shuffles, ids only") {
    val p = plan(Funnel.qRetention(spark, sf0001))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges <= 2,
      s"retention must shuffle at most twice (user window, cell agg):\n$p")
    assert(!p.contains("props") && !p.contains("event_type"),
      s"retention must prune all event columns except user_id/ts:\n$p")
  }
}
