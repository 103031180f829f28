package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.queries.{Analytics, Attribution, BloomJoin, Cohort, Compact, Dpp, ExistsSubquery, Funnel, GlobalScalar, Hierarchy, HeavyHitters, Integrity, IntervalOverlap, Lateral, MarketBasket, Merge, Nested, Pagerank, Paths, RateSpike, RecursiveCte, Rfm, Sample, ScalarSubquery, Sketches, SkewAqe, Skyline, Stats, Timeline, Triangle, VariantOps, Zorder}
import graft.similarity.{Ann, Ivf}
import graft.streaming.{AnnStream, EventStream, EventTimeSessionsTws,
  InactivityTws, TfRecordStream, TypeCensusTws, UserStatsTws}
import graft.svm.SvmQueries
import graft.text.TextOps

/** Driver contract — the full capability inventory of SURVEY.md §2.
  *
  * Every entry in [[queries]] is one operator; entries with a matching
  * key in [[oracleSql]] are hash-verified against DuckDB running the
  * equivalent ANSI SQL on the same parquet tables; the rest (training /
  * LSH candidate generation, not SQL-expressible) get rows-only checks.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q5MultiJoin(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2a — reference surface (parallel SVM engine)
    "svm_part_stats" -> SvmQueries.partStats _,
    "svm_partition" -> SvmQueries.partition _,
    "svm_partition_random" -> ((s: SparkSession, d: String) => graft.svm.Partitioner.balancedRandomSizes(s, d)),
    "svm_linear_train" -> SvmQueries.linearTrain _,
    "svm_cascade_train" -> SvmQueries.cascadeTrain _,
    // Opt-in dense-regime fallback: guard trips → route to the linear
    // scale path, switch recorded in the trace (fail-loud default kept).
    "svm_cascade_auto" -> SvmQueries.cascadeAutoTrain _,
    "svm_bagging_train" -> SvmQueries.baggingTrain _,
    "svm_iterative_train" -> SvmQueries.iterativeTrain _,
    "svm_cascade_train_rbf" -> SvmQueries.cascadeTrainRbf _,
    // closed-form solver fidelity: four tiny problems whose max-margin
    // solutions are known analytically (KKT by hand) — α-vector, SV
    // set, rho and dual objective all pinned as exact literals. The
    // numeric ground truth the rows-only training traces lack.
    "svm_solver_pin" -> ((s: SparkSession, d: String) => graft.svm.SolverPin.solverPin(s, d)),
    "svm_predict" -> SvmQueries.predictFixed _,
    "svm_evaluate" -> SvmQueries.centroidEvaluate _,
    // Held-out evaluation of the meta-algorithms (id-parity split):
    // per-class train AND holdout accuracy side by side for cascade +
    // bagging — the number the reference never reports (it evaluates
    // on its own training set). Literal-pinned trace oracle.
    "svm_holdout_eval" -> SvmQueries.holdoutEval _,
    "svm_model_io" -> SvmQueries.modelIo _,
    "svm_kernel_gram" -> SvmQueries.kernelGram _,
    // Distributed (C, γ) grid search with 5-fold CV on the fixed noisy
    // rings sample — model selection parallelized across the GRID (one
    // SMO solve per task, zero shuffles before the 45-row rollup).
    "svm_grid_search" -> ((s: SparkSession, d: String) => graft.svm.GridSearch.gridSearch(s, d)),
    // LibSVM's svm-scale step: per-dimension [-1,1] rescale — one
    // map-side-combined bounds pass, bounds applied as two referenced
    // literal arrays (never 64 unrolled expression trees).
    "svm_scale" -> ((s: SparkSession, d: String) => graft.svm.SvmScale.svmScale(s, d)),
    // §2b — analytics surface
    "q1_agg" -> Analytics.q1Agg _,
    "q3_join" -> Analytics.q3Join _,
    "q5_multijoin" -> Analytics.q5MultiJoin _,
    "q6_filter" -> Analytics.q6Filter _,
    "q_window" -> Analytics.qWindow _,
    "q_rollup" -> Analytics.qRollup _,
    "q_cube" -> Analytics.qCube _,
    "q_grouping_sets" -> Analytics.qGroupingSets _,
    "q_events_sessionize" -> Analytics.qSessionize _,
    // Gaps-and-islands: day_idx − row_number() is constant within a
    // consecutive run — maximal streaks via one groupBy, no self-join.
    "q_islands" -> graft.queries.Islands.qIslands _,
    // rank/dense_rank/percent_rank/cume_dist in ONE Window pass; the
    // relative members are single exact-int divisions, round(6)-safe.
    "q_percent_rank_cume" -> graft.queries.RankFamily.qPercentRankCume _,
    "q_semi_anti" -> Analytics.qSemiAnti _,
    "q_topk_per_group" -> Analytics.qTopKPerGroup _,
    "q_asof_join" -> ((s: SparkSession, d: String) => Analytics.qAsofJoin(s, d)),
    "q_asof_tolerance" -> ((s: SparkSession, d: String) => Analytics.qAsofTolerance(s, d)),
    // Forward direction through the SAME backward linear-merge plan
    // via time negation; DuckDB's native forward ASOF is the oracle.
    "q_asof_forward" -> ((s: SparkSession, d: String) => Analytics.qAsofForward(s, d)),
    "q_distinct_agg" -> Analytics.qDistinctAgg _,
    // N distinct aggregates in ONE Expand-rewritten pass (no N-way
    // self-join of sub-aggregations; plan-pinned).
    "q_multi_distinct" -> graft.queries.MultiDistinct.qMultiDistinct _,
    "q_outer_join" -> Analytics.qOuterJoin _,
    "q_percentiles" -> Analytics.qPercentiles _,
    "q_pivot" -> Analytics.qPivot _,
    // The inverse reshape: the pivot output melted back to long rows
    // via native Dataset.unpivot (Expand, shuffle-free).
    "q_unpivot" -> Analytics.qUnpivot _,
    "q_moving_avg" -> Analytics.qMovingAvg _,
    "q_setops" -> Analytics.qSetOps _,
    "q_salted_join" -> Analytics.qSaltedJoin _,
    // The automatic twin of q_salted_join: AQE splits the planted hot
    // partition at runtime; re-plan must be invisible in the result.
    "q_skew_aqe" -> SkewAqe.qSkewAqe _,
    "q_sql_vec" -> Analytics.qSqlVec _,
    "q_skew_histogram" -> Analytics.qSkewHistogram _,
    "q_skyline" -> Skyline.qSkyline _,
    "q_triangle" -> Triangle.qTriangle _,
    "q_pagerank" -> Pagerank.qPagerank _,
    // DataSketches HLL tier: mergeable per-type sketches, union row
    // re-aggregates kilobyte states — no data rescan.
    "q_hll_sketch" -> Sketches.qHllSketch _,
    // The EXACT tier: dense-domain bitmap distinct (custom mergeable
    // TypedImperativeAggregate) — the bitmap cardinality must EQUAL
    // the oracle's count(DISTINCT), no tolerance band.
    "q_bitmap_distinct" -> ((s: SparkSession, d: String) => Sketches.qBitmapDistinct(s, d)),
    // Sparse-domain fallback: ids planted at ~2^40 offsets trip the
    // dense guard; dictionary re-densification (bucket-ranked, no
    // global sort) feeds the same exact bitmap machinery.
    "q_bitmap_sparse" -> ((s: SparkSession, d: String) => Sketches.qBitmapSparse(s, d)),
    // The >2^31-distinct tier of the sparse path, forced at toy scale
    // with shardCapacity=8: the contiguous dictionary index space
    // range-shards into per-shard constant-size bitmaps (shard =
    // idx / capacity), cardinalities summed across disjoint shards,
    // union OR'd WITHIN each shard then summed. In production the
    // capacity defaults to Int.MaxValue and the dispatch is automatic.
    "q_bitmap_sharded" -> ((s: SparkSession, d: String) =>
      Sketches.qBitmapSparse(s, d, shardCapacity = 8L)),
    // Segment-intersection matrix: one corpus scan into per-type
    // bitmaps, pairwise AND+popcount on k rows (ReusedExchange-pinned).
    "q_segment_overlap" -> ((s: SparkSession, d: String) => graft.queries.SegmentOverlap.qSegmentOverlap(s, d)),
    // Rolling 7-day active users: per-day mergeable bitmaps fanned to
    // the ≤7 windows they serve — events scanned once, not per frame.
    "q_rolling_distinct" -> ((s: SparkSession, d: String) => graft.queries.RollingDistinct.qRollingDistinct(s, d)),
    // Spark 4 VARIANT shredding: parse once, typed-path traversals
    // (incl. a nested re-parse), round-trip exactness vs base columns.
    "q_variant_extract" -> VariantOps.qVariantExtract _,
    // Correlated LATERAL (ORDER BY LIMIT) — decorrelated by Catalyst
    // into one WindowGroupLimit scan + broadcast join (plan-pinned).
    "q_lateral_topk" -> Lateral.qLateralTopK _,
    // Correlated SCALAR-AGGREGATE subquery (TPC-H q17 shape) —
    // decorrelated into one per-part aggregate + join, never a
    // per-outer-row re-execution; DuckDB runs the SAME SQL text.
    "q_scalar_subquery" -> ScalarSubquery.qScalarSubquery _,
    // Correlated EXISTS/NOT EXISTS — the predicate-subquery SQL text,
    // decorrelated into left-semi + left-anti hash joins (plan-pinned).
    "q_exists_subquery" -> ExistsSubquery.qExistsSubquery _,
    // TPC-H Q22 shape: UNCORRELATED scalar-aggregate subquery (global
    // avg balance, executed ONCE — plan-pinned to one SubqueryExec) +
    // NOT EXISTS + substring-IN, one SQL text both engines.
    "q_global_scalar" -> GlobalScalar.qGlobalScalar _,
    // TPC-H Q2 shape: correlated scalar MIN over a multi-table join,
    // decorrelated to a per-part min aggregate + equi-join (no nested
    // loop — plan-pinned); offers CTE derived once from lineitem.
    "q_min_cost_supplier" -> graft.queries.MinCostSupplier.qMinCostSupplier _,
    // TPC-H Q15 shape: revenue view joined AND max'd in one statement;
    // the global MAX runs once (plan-pinned single scalar subquery).
    "q_top_revenue_view" -> graft.queries.TopRevenueView.qTopRevenueView _,
    // TPC-H Q20 shape: nested IN containing an inner IN + a correlated
    // scalar aggregate — stacked left-semi joins, decorrelated agg.
    "q_nested_in_scalar" -> graft.queries.NestedInScalar.qNestedInScalar _,
    // TPC-H Q7 shape: six-table join with the disjunctive cross-nation
    // predicate riding the equi joins as a filter (no nested loop).
    "q_volume_shipping" -> graft.queries.VolumeShipping.qVolumeShipping _,
    // TPC-H Q8 shape: the eight-table join feeding a CASE-inside-SUM
    // conditional ratio; exact integer sums, one double division.
    "q_market_share" -> graft.queries.MarketShare.qMarketShare _,
    // TPC-H Q11 shape: grouped aggregate filtered against a fraction
    // of its own global total — two uncorrelated scalars over one CTE,
    // cross-multiplied to pure integer arithmetic.
    "q_important_stock" -> graft.queries.ImportantStock.qImportantStock _,
    // TPC-H Q19 shape: disjunction-of-conjunctions join predicate; the
    // common equi conjunct must factor out (hash join, never a loop).
    "q_disjunctive_join" -> graft.queries.DisjunctiveJoin.qDisjunctiveJoin _,
    // TPC-H Q12 shape: two-way CASE-count priority split per class.
    "q_ship_priority" -> graft.queries.ShipPriority.qShipPriority _,
    // TPC-H Q9 shape: LIKE-filtered part through the five-table chain,
    // expression group keys, three-table profit measure.
    "q_profit_measure" -> graft.queries.ProfitMeasure.qProfitMeasure _,
    // TPC-H Q10 shape: top-20 returned-item customer report —
    // TakeOrdered, never a full sort of |customers|.
    "q_returned_item" -> graft.queries.ReturnedItem.qReturnedItem _,
    // TPC-H Q14 shape: two conditional aggregates over ONE fact scan.
    "q_promo_effect" -> graft.queries.PromoEffect.qPromoEffect _,
    // TPC-H Q16 shape: per-bucket distinct-supplier count with a
    // NOT IN exclusion (null-aware anti + distinct expansion).
    "q_parts_supplier" -> graft.queries.PartsSupplier.qPartsSupplier _,
    // TPC-H Q21 shape: double-correlated EXISTS + NOT EXISTS against
    // the SAME fact with an inequality correlation (other-supplier
    // lines on the same order) — left-semi + left-anti, both equi on
    // l_orderkey, nation dim broadcast-filtered first.
    "q_multi_exists" -> ((s: SparkSession, d: String) => graft.queries.MultiExists.qMultiExists(s, d)),
    // Latest-record-per-key as a max_by AGGREGATE (one partial-agg
    // shuffle of |keys| rows) — no window sort over the fact; ties
    // total-ordered by the (ts, event_id) struct.
    "q_latest_by_key" -> ((s: SparkSession, d: String) => graft.queries.LatestByKey.qLatestByKey(s, d)),
    // NOT IN three-valued NULL semantics: one planted NULL collapses
    // the predicate to empty; NOT EXISTS is the NULL-proof twin.
    "q_not_in_null" -> graft.queries.NotInNull.qNotInNull _,
    // TPC-H Q18 shape: IN over a grouped+HAVING subquery — the semi
    // key set is itself an aggregate; pruned before the wide join.
    "q_group_having_in" -> graft.queries.GroupHavingIn.qGroupHavingIn _,
    // TPC-H Q13 shape: order filter inside the preserved outer join so
    // zero-order customers keep their bucket; per-customer count rides
    // the join exchange.
    "q_custdist" -> graft.queries.CustDist.qCustdist _,
    // TPC-H Q19 shape: OR-of-ANDs across both join sides — per-side
    // disjunctions extracted and pushed into both scans (plan-pinned).
    "q_or_pushdown" -> graft.queries.OrPushdown.qOrPushdown _,
    // EXCEPT ALL / INTERSECT ALL: multiset semantics via Catalyst's
    // count-tag + Generate rewrite — one value-keyed shuffle, no join.
    "q_except_all" -> graft.queries.BagSetOps.qExceptAll _,
    // Interval coalesce: merge overlapping per-user intervals via the
    // running-max break rule; exact µs union lengths, one exchange.
    "q_interval_merge" -> graft.queries.IntervalMerge.qIntervalMerge _,
    // first/last/nth_value + IGNORE NULLS under the full ROWS frame
    // and a total order — the positional window family, one exchange.
    "q_first_last" -> graft.queries.FirstLast.qFirstLast _,
    // grouping()/grouping_id under rollup with PLANTED real NULLs —
    // subtotal-NULL vs data-NULL disambiguation, one Expand pass.
    "q_grouping_id" -> graft.queries.GroupingId.qGroupingId _,
    // Calendar surface: date_trunc/year/quarter/month cross-engine
    // agreement (the semantics the integer-µs rows deliberately dodge).
    "q_calendar" -> graft.queries.Calendar.qCalendar _,
    // <=> vs = on planted NULL keys: equality silently drops NULL-key
    // rows, null-safe routes them — both censuses in one output.
    "q_null_safe_join" -> graft.queries.NullSafeJoin.qNullSafeJoin _,
    // explode vs explode_outer on an empty-heavy collection: inner
    // unnest loses entities, outer keeps them with a NULL element.
    "q_explode_outer" -> graft.queries.ExplodeOuter.qExplodeOuter _,
    // CEP / MATCH_RECOGNIZE class: per-user ordered event strings,
    // behavioral patterns counted as non-overlapping regex matches.
    "q_sequence_match" -> graft.queries.SequenceMatch.qSequenceMatch _,
    // Multi-touch attribution: last-touch + linear in exact integer
    // cents (remainder to the earliest touch — allocations sum to the
    // purchase, no float drift).
    "q_attribution" -> Attribution.qAttribution _,
    // Top behavioral trigram paths: one user exchange for both lags,
    // |types|^3-key rollup, TakeOrderedAndProject cut.
    "q_paths" -> ((s: SparkSession, d: String) => Paths.qPaths(s, d)),
    "q_approx_distinct" -> Analytics.qApproxDistinct _,
    "q_range_join" -> Analytics.qRangeJoin _,
    "q_json_extract" -> Analytics.qJsonExtract _,
    "q_approx_percentile" -> Analytics.qApproxPercentile _,
    "q_funnel" -> Funnel.qFunnel _,
    // Time-constrained funnel: every step within W of the FIRST step
    // (the ClickHouse windowFunnel class) — greedy earliest-step chain.
    "q_window_funnel" -> ((s: SparkSession, d: String) => graft.queries.WindowFunnel.qWindowFunnel(s, d)),
    "q_retention" -> Funnel.qRetention _,
    "q_range_frame" -> Funnel.qRangeFrame _,
    "q_dpp" -> Dpp.qDpp _,
    "q_nested" -> Nested.qNested _,
    "q_listagg" -> Nested.qListagg _,
    "q_mode" -> Stats.qMode _,
    "q_integrity" -> Integrity.qIntegrity _,
    // One-pass table profiling: per-column null/distinct/min/max in a
    // single scan; the N exact distincts ride one Expand rewrite.
    "q_profile" -> graft.queries.Profile.qProfile _,
    // Herfindahl concentration in basis points: the RATIONAL diversity
    // metric (no transcendental log) — exact decimal squares, one div.
    "q_hhi" -> graft.queries.Hhi.qHhi _,
    // Exact chi-square uniformity test: N·k·χ² = Σ(O·k−N)² — integer
    // test statistic, densified cell grid, broadcast dims.
    "q_chisq" -> graft.queries.ChiSq.qChiSq _,
    "q_scd2" -> Timeline.qScd2 _,
    // The time-travel consumer of that history: AS-OF snapshot census
    // by interval containment vs a ranked-log oracle.
    "q_time_travel" -> graft.queries.TimeTravel.qTimeTravel _,
    "q_gapfill" -> Timeline.qGapfill _,
    "q_transition" -> Timeline.qTransition _,
    "q_interval_overlap" -> IntervalOverlap.qIntervalOverlap _,
    "q_rate_spike" -> RateSpike.qRateSpike _,
    "q_zorder" -> Zorder.qZorder _,
    // Small-file compaction (OPTIMIZE bin-packing): fragmented layout
    // rebuilt into full files via ONE range shuffle; census invisible.
    "q_compact" -> ((s: SparkSession, d: String) => Compact.qCompact(s, d)),
    "q_merge_upsert" -> Merge.qMergeUpsert _,
    // Snapshot diff / CDF census: one co-partitioned full outer join,
    // per-class counts + key-sum + exact cents delta certificates.
    "q_snapshot_diff" -> graft.queries.SnapshotDiff.qSnapshotDiff _,
    // Incremental MV refresh: mergeable states (count/sum/min/max),
    // refresh cost ∝ the drop — zero raw-corpus rescans (spec-pinned);
    // oracle is the full recompute, so refresh == recompute.
    "q_incremental_agg" -> graft.queries.IncrementalAgg.qIncrementalAgg _,
    // Streaming CDC apply: file-per-micro-batch change feed reconciled
    // into keyed state via foreachBatch; census equals the batch merge
    // with the extra version-2 wave folded in.
    "stream_merge" -> ((s: SparkSession, d: String) => graft.streaming.MergeStream.runMergeBounded(s, d)),
    // Streaming twin of q_rate_spike: per-hour counts merge additively
    // across micro-batches (hours straddle files — carried state is
    // load-bearing), trailing-24h sweep over the |hours|-row state.
    "stream_rate_spike" -> ((s: SparkSession, d: String) => graft.streaming.RateSpikeStream.runRateSpikeBounded(s, d)),
    "stream_topk" -> ((s: SparkSession, d: String) => graft.streaming.TopKStream.runTopKBounded(s, d)),
    // Incremental EXACT distinct: running per-type bitmap state ORs
    // each micro-batch's bitmaps — counts can't merge, sets can.
    "stream_bitmap_distinct" -> ((s: SparkSession, d: String) => graft.streaming.BitmapStream.runBitmapBounded(s, d)),
    // The sketch twin: kilobyte HLL union states — the carry an
    // unbounded-domain stream can afford; 2%-band census contract.
    "stream_hll_distinct" -> ((s: SparkSession, d: String) => graft.streaming.HllStream.runHllBounded(s, d)),
    "dedup_editdist" -> ((s: SparkSession, d: String) => graft.dedup.EditDist.editDistPairs(s, d)),
    "q_hierarchy" -> Hierarchy.qHierarchy _,
    "q_recursive_cte" -> RecursiveCte.qRecursiveCte _,
    "q_market_basket" -> MarketBasket.qMarketBasket _,
    "q_rfm" -> Rfm.qRfm _,
    "q_cohort" -> Cohort.qCohort _,
    "q_sample_stratified" -> Sample.qSampleStratified _,
    "q_bloom_join" -> BloomJoin.qBloomJoin _,
    "q_stats_moments" -> Stats.qStatsMoments _,
    // Robust median/MAD outlier census: exact order statistics via the
    // domain-bounded frequency-table route — no per-group global sort.
    "q_anomaly_mad" -> graft.queries.AnomalyMad.qAnomalyMad _,
    // Grouped correlation/regression from EXACT decimal sufficient
    // stats: integral slope, correctly-rounded sqrt for corr only.
    "q_corr" -> graft.queries.Corr.qCorr _,
    // Multi-source frontier BFS on a cyclic planted grid: min-hop
    // distances within an 8-round radius, anti-join settlement.
    "q_shortest_path" -> graft.queries.ShortestPath.qShortestPath _,
    "q_ntile" -> Stats.qNtile _,
    "q_heavy_hitters" -> HeavyHitters.qHeavyHitters _,
    // §2c — LLM-data-pipeline operators
    "dedup_exact" -> Dedup.exact _,
    "dedup_survivors" -> Dedup.exactSurvivors _,
    // Exact-substring dedup: docs sharing a 12-token window flagged
    // via the distributed inverted-index formulation (Substring.scala).
    "dedup_substring" -> ((s: SparkSession, d: String) => graft.dedup.Substring.substringAudit(s, d)),
    // Span structure of the sharing: maximal runs of consecutive
    // shared windows per doc (the unit substring dedup removes).
    "dedup_substring_spans" -> ((s: SparkSession, d: String) => graft.dedup.Substring.substringSpans(s, d)),
    // The near-dup/ANN pipelines run over corpora with PLANTED
    // duplicates (pure column arithmetic, rebuilt verbatim by the SQL
    // oracle), which turns LSH/IVF *recall* into a hash-verified
    // result. The recall-vs-brute-force summaries stay spec-covered
    // (DedupSpec/AnnSpec).
    "dedup_minhash" -> ((s: SparkSession, d: String) => Dedup.minhashPlantedRecall(s, d)),
    "dedup_simhash" -> ((s: SparkSession, d: String) => Dedup.simhashPlantedRecall(s, d)),
    "dedup_ngram_jaccard" -> ((s: SparkSession, d: String) => Dedup.ngramJaccardConsecutive(s, d)),
    "dedup_embedding" -> ((s: SparkSession, d: String) => Dedup.embeddingPlantedRecall(s, d)),
    // GRADED near-dup tiers (graft.dedup.NearDup): recall under genuine
    // near-duplicates — truncation tiers at Jaccard ≈ 0.55/0.70/0.85,
    // scattered-swap tiers for SimHash, exact-angle rotations at cosine
    // 0.95/0.97/0.99, and noised ANN probes. Per-tier realized recall is
    // compared to margins set below the analytic expectation; the
    // booleans are oracle-pinned, so detuning bands/tables/multiprobe
    // breaks the hash check.
    "dedup_minhash_near" -> ((s: SparkSession, d: String) => graft.dedup.NearDup.minhashNearRecall(s, d)),
    // Pair → cluster → survivor: verified near-dup pairs are clustered
    // by connected components (min-label propagation + pointer jumping)
    // and ONE keeper survives per cluster. The planted 2-link chains
    // (J(a,b) ≈ J(b,c) ≈ 0.90, J(a,c) ≈ 0.81, threshold 0.85) make the
    // closure itself the thing under test: {a, a+1M, a+2M} must merge
    // without an a–c pair ever being emitted.
    "dedup_near_survivors" -> ((s: SparkSession, d: String) => graft.dedup.Cluster.nearDupSurvivors(s, d)),
    // Train/holdout assignment at the near-dup-CLUSTER level: no two
    // near-duplicates ever straddle the split; `leak_clusters` counts
    // the clusters a doc-level hash split WOULD have torn apart.
    "corpus_split_leakproof" -> ((s: SparkSession, d: String) => graft.dedup.Cluster.leakproofSplit(s, d)),
    "dedup_simhash_near" -> ((s: SparkSession, d: String) => graft.dedup.NearDup.simhashNearRecall(s, d)),
    // Incremental (continual-crawl) dedup: a synthetic new batch
    // (verbatim / truncated / reversed+nonce copies by id arithmetic)
    // classified against the snapshot as exact_dup / near_dup / novel.
    "dedup_incremental" -> ((s: SparkSession, d: String) => graft.dedup.Incremental.incrementalClassify(s, d)),
    // Same census through the production day-2 path: snapshot hashes /
    // capped band buckets / shingles persisted once as parquet, the
    // drop classified reading the INDEX — snapshot text never
    // re-shingled (scan-audited in IncrementalSpec).
    "dedup_incremental_indexed" -> ((s: SparkSession, d: String) => graft.dedup.Incremental.incrementalClassifyIndexed(s, d)),
    "dedup_embedding_near" -> ((s: SparkSession, d: String) => graft.dedup.NearDup.embeddingNearRecall(s, d)),
    // SemDeDup (Abbas et al. 2023): k-means clusters bound candidate
    // generation (within-cluster pairs only, guarded cluster sizes) —
    // the third near-dup candidate family next to hash bands and
    // hyperplane-LSH buckets. Same graded-cosine planted contract.
    "dedup_semantic" -> ((s: SparkSession, d: String) => graft.dedup.Semantic.semanticDedupRecall(s, d)),
    // Corpus k-means clustering (curation primitive under SemDeDup):
    // exact-copy co-assignment is structural (assignment is a pure
    // function of the embedding), c99 co-assignment pins with margin,
    // and the fit row pins Lloyd's objective against its own seed.
    "corpus_cluster" -> ((s: SparkSession, d: String) => graft.dedup.Semantic.clusterRecall(s, d)),
    "ann_near_top1" -> ((s: SparkSession, d: String) => graft.dedup.NearDup.annNearTop1(s, d)),
    // attribute-filtered ANN: the predicate runs INSIDE the list scan
    // before top-k — the planted exact-dup decoy fails the filter, so
    // post-filtering could not produce the pinned answer.
    "ann_filtered" -> ((s: SparkSession, d: String) => graft.similarity.FilteredAnn.filteredTop1(s, d)),
    "ann_filtered_hnsw" -> ((s: SparkSession, d: String) => graft.similarity.FilteredAnn.filteredTop1Hnsw(s, d)),
    "ann_bruteforce" -> ((s: SparkSession, d: String) => Ann.bruteForceTopK(s, d)),
    // recall@10 among DENSE competition: every center gets 12 planted
    // neighbors at graded cosines 0.99..0.88, ground truth is the
    // engine's own (separately oracle-ranked) brute force, and realized
    // recall must clear 0.95 per method (measured 0.991-1.0; detuned
    // tables/nProbe fall below the pin).
    "ann_recall_atk" -> ((s: SparkSession, d: String) => Ann.annRecallAtK(s, d)),
    // Graph ANN tier (HNSW-class, NSW-lite per shard): per-shard
    // in-memory small-world graphs, beam search under a HARD eval cap
    // equal to IVF's 1/4 scan budget; recall@10 must clear the same
    // 0.95 bar as the IVF row measured side by side on the same
    // probes/truth — the equal-candidate-budget family comparison.
    "ann_hnsw" -> ((s: SparkSession, d: String) => graft.similarity.Hnsw.annHnsw(s, d)),
    "ann_lsh" -> ((s: SparkSession, d: String) => Ann.lshPlantedTop1(s, d)),
    "ann_ivf" -> ((s: SparkSession, d: String) => Ivf.ivfPlantedTop1(s, d)),
    // Incremental IVF add (the index's day-2 shape): a batch of new
    // vectors assigned against the FROZEN quantizer and appended —
    // per-add work proportional to the batch; fresh index must reach
    // the inserts, the stale index must see nothing near the probes.
    "ann_ivf_incremental" -> ((s: SparkSession, d: String) =>
      graft.similarity.IvfIncremental.incrementalContract(s, d)),
    // The delete half of day-2 maintenance: ids-only tombstone
    // anti-join; before/after reachability + census literal-pinned.
    "ann_ivf_delete" -> ((s: SparkSession, d: String) =>
      graft.similarity.IvfDelete.deleteContract(s, d)),
    // Product quantization: compressed-domain ADC scan + exact re-rank;
    // recall@10 over the same dense clustered corpus as ann_recall_atk,
    // pinned >= 0.90 (measured via RecallProbe; detuned m/ksub/rerank
    // falls below the pin).
    "ann_pq" -> ((s: SparkSession, d: String) => graft.similarity.Pq.pqRecallAtK(s, d)),
    // OPQ-style fixed orthogonal rotation ahead of PQ: on a corpus
    // whose signal is concentrated in sub-space 0, plain PQ must FAIL
    // the recall pin and the rotated pipeline must clear it.
    "ann_opq" -> ((s: SparkSession, d: String) => graft.similarity.Opq.opqRecallContrast(s, d)),
    // Rotation composed with the full IVF-PQ index shape: plain
    // IVF-PQ's in-list PQ codes collapse on concentrated variance,
    // the rotated pipeline holds recall 1.0.
    "ann_opq_ivf" -> ((s: SparkSession, d: String) => graft.similarity.Opq.opqIvfRecallContrast(s, d)),
    "ann_opq_trained" -> ((s: SparkSession, d: String) => graft.similarity.Opq.opqTrainedContrast(s, d)),
    // IVF-PQ composition (billion-scale shape: coarse lists restrict
    // the scan, ADC ranks in compressed domain, exact re-rank): the
    // planted duplicate shares list AND code word, so it must return
    // top-1 at cosine 1.0.
    "ann_ivf_pq" -> ((s: SparkSession, d: String) => graft.similarity.Pq.ivfPqPlantedTop1(s, d)),
    "text_langid" -> TextOps.langId _,
    "text_ngram_counts" -> ((s: SparkSession, d: String) => TextOps.ngramCounts(s, d)),
    "text_token_budget" -> TextOps.tokenBudget _,
    "text_quality" -> TextOps.qualityScores _,
    "text_tokens" -> TextOps.tokenStats _,
    "text_fingerprint" -> TextOps.fingerprints _,
    // PII scrub audit: planted id-derived emails/IPs/phones/SSNs must
    // each be counted, located, measured (chars redacted) and fully
    // removed (residual = 0) — the oracle recomputes all four numbers
    // from the identical RE2 patterns on the rebuilt planted corpus.
    "text_pii_scrub" -> ((s: SparkSession, d: String) => graft.text.Pii.piiScrub(s, d)),
    // Repetition quality signal: word-3-gram multiset stats per lang;
    // planted degenerate docs (10-token prefix × 5) must be flagged —
    // the per-doc flag is exact integer arithmetic, so one missed or
    // phantom flag is a hash break.
    "text_repetition" -> ((s: SparkSession, d: String) => graft.text.Repetition.repetitionStats(s, d)),
    // Two-pass vocabulary-statistics scoring (OOV/rare-token filter):
    // corpus vocab counts, then docs scored against the rare set;
    // planted nonce-token docs (frequency exactly 1) must be flagged.
    "text_rare_tokens" -> ((s: SparkSession, d: String) => graft.text.RareTokens.rareTokenStats(s, d)),
    // Per-doc salient terms: tf·N/df (idf log dropped — transcendental-
    // free exact ranking), top-3 per doc via WindowGroupLimit.
    "text_tfidf" -> ((s: SparkSession, d: String) => graft.text.Tfidf.tfidfTopK(s, d)),
    "text_bpe_train" -> ((s: SparkSession, d: String) => graft.text.BpeTrain.textBpeTrain(s, d)),
    "text_bpe_encode" -> ((s: SparkSession, d: String) => graft.text.BpeTrain.textBpeEncode(s, d)),
    // Unigram-LM (SentencePiece-class) tokenizer: Viterbi hard-EM over
    // the distinct-word table with integer-quantized log2 scores.
    "text_unigram_train" -> ((s: SparkSession, d: String) => graft.text.UnigramLm.textUnigramTrain(s, d)),
    // The consuming half: per-doc piece counts under the trained vocab.
    "text_unigram_encode" -> ((s: SparkSession, d: String) => graft.text.UnigramLm.textUnigramEncode(s, d)),
    // Bigram-LM surprise (perplexity-gate quality filter): exact
    // integer floor(log2 1/p) scores — bit-identical cross-engine,
    // no libm — top-20 most surprising docs.
    "text_lm_surprise" -> ((s: SparkSession, d: String) => graft.text.LmSurprise.textLmSurprise(s, d)),
    // URL canonicalization census: planted variant spellings (case,
    // scheme-gated default port, fragment, utm params, param order)
    // collapse onto one canonical key; http://host:443 survives.
    "text_url_normalize" -> ((s: SparkSession, d: String) => graft.text.UrlNormalize.textUrlNormalize(s, d)),
    // Crawl-stage URL dedup: canonical key, min-doc_id keeper,
    // per-host survivor economics.
    "dedup_url" -> ((s: SparkSession, d: String) => graft.text.UrlNormalize.dedupUrl(s, d)),
    // Exact-integer entropy floor (bitlen identity — no libm): the
    // low-entropy boilerplate gate next to repetition/rare-token.
    "text_entropy" -> ((s: SparkSession, d: String) => graft.text.Entropy.textEntropy(s, d)),
    // Deterministic training-order shuffle: md5(seed, doc_id) order
    // key, shard = key bit-slice — coordinator-free, cross-engine
    // pinned permutation, per-shard manifest.
    "corpus_shuffle" -> ((s: SparkSession, d: String) => graft.text.CorpusShuffle.corpusShuffle(s, d)),
    // The physical sorted-shard writer: repartition(shard) +
    // sortWithinPartitions (parallel local sorts, no global exchange),
    // audit re-derived from the written files proves in-file order.
    "corpus_shuffle_write" -> ((s: SparkSession, d: String) => graft.text.CorpusShuffle.corpusShuffleWrite(s, d)),
    // Sequence packing OVER the shuffled order (pipeline composed
    // end-to-end): the okey-keyed two-level distributed prefix sum.
    "corpus_shuffle_pack" -> ((s: SparkSession, d: String) => graft.text.CorpusShuffle.corpusShufflePack(s, d)),
    // Avro DSv2 source/sink round-trip: census from the read-back vs
    // the oracle's census of the original parquet.
    "src_avro_roundtrip" -> ((s: SparkSession, d: String) => graft.sources.AvroQueries.srcAvroRoundtrip(s, d)),
    // TFRecord DSv2 source/sink round-trip (the TF/JAX dataloader
    // interchange format): census from the read-back vs the oracle's
    // census of the original parquet.
    "src_tfrecord_roundtrip" -> ((s: SparkSession, d: String) => graft.sources.TfRecordQueries.srcTfRecordRoundtrip(s, d)),
    // WebDataset tar-shard DSv2 source/sink round-trip (the PyTorch
    // dataloader interchange format): POSIX ustar + consecutive-member
    // sample grouping; census from the read-back incl. __key__.
    "src_webdataset_roundtrip" -> ((s: SparkSession, d: String) => graft.sources.WdsQueries.srcWebdatasetRoundtrip(s, d)),
    // The final trainer hand-off: tokenized corpus → TFRecord shards
    // (variable-length int64 lists) → read-back census.
    "corpus_export_tfrecord" -> ((s: SparkSession, d: String) => graft.text.Export.corpusExportTfRecord(s, d)),
    // The dataset release card: per-language volumes, exact-dup mass,
    // densities — one scan, two map-side aggregations, a |langs| join.
    "corpus_datacard" -> ((s: SparkSession, d: String) => graft.text.Datacard.corpusDatacard(s, d)),
    // The card + NEAR-dup mass from the engine's real cluster manifest
    // (minhash-LSH → verify → connected components), attributed to the
    // keeper's language; oracle = planted-chain arithmetic (3/chain).
    "corpus_datacard_neardup" -> ((s: SparkSession, d: String) => graft.text.Datacard.corpusDatacardNearDup(s, d)),
    // Per-dimension univariate ROC-AUC (feature screening) via the
    // exact Mann-Whitney midrank formula.
    "svm_feature_auc" -> ((s: SparkSession, d: String) => graft.svm.FeatureAuc.featureAuc(s, d)),
    "mm_metadata" -> Multimodal.metadataStats _,
    "mm_features" -> Multimodal.featureSummary _,
    // real-codec leg: PNG lossless round-trip with exact channel sums,
    // JPEG lossy round-trip with exact dims + bounded distortion.
    "mm_jpeg" -> graft.multimodal.ImageCodec.jpegSummary _,
    "mm_frames" -> ((s: SparkSession, d: String) => Multimodal.frameSummary(s, d)),
    // Perceptual-hash image dedup over REAL decoded PPM rasters.
    "mm_phash" -> ((s: SparkSession, d: String) => Multimodal.phashDedup(s, d)),
    // Hamming-near image dedup over DISTINCT hash groups, sharded by
    // image-size class with bands sized to the occupied bit range
    // (complete for d ≤ 3 structurally), exact bit_count verify, loud
    // bucket guard; planted 1-flip / 3-flip twins must ALL surface at
    // their exact distance.
    "mm_phash_near" -> ((s: SparkSession, d: String) => graft.multimodal.PhashNear.phashNearRecall(s, d)),
    // Scene segmentation over the sampled frames: cut where adjacent
    // frame peaks differ > τ; peaks are bit-identical cross-engine.
    "mm_scene_cut" -> ((s: SparkSession, d: String) => Multimodal.sceneCut(s, d)),
    // REAL video container: MJPEG-in-AVI demux (strict RIFF walk) +
    // per-frame javax.imageio JPEG decode + luminance scene cuts;
    // oracle recomputes frame count / dims / cut count from the id
    // formula codec-free, malformed containers counted not crashed.
    "mm_video" -> ((s: SparkSession, d: String) => graft.multimodal.Avi.videoSummary(s, d)),
    // REAL RIFF/PCM WAV parse (magic strings, little-endian fields,
    // chunk sizing) over arithmetic-generated audio; rate/samples/
    // duration/loudness recomputed by the oracle from the generation
    // formula, malformed payloads counted not crashed.
    "mm_audio" -> ((s: SparkSession, d: String) => Multimodal.audioSummary(s, d)),
    "mm_resize" -> ((s: SparkSession, d: String) => Multimodal.resizeSummary(s, d)),
    "corpus_filter" -> graft.text.CorpusFilter.funnel _,
    // Trained quality-classifier filter (the CCNet/WebText recipe):
    // planted junk (proportional digit payload → structural feature
    // gap vs natural docs in every language), LinearSVC on the
    // text_quality ratio signals, held-out per-class accuracy pinned
    // at 1.0 with n_eval from the plant arithmetic.
    "corpus_quality_svm" -> ((s: SparkSession, d: String) => graft.text.QualitySvm.qualitySvm(s, d)),
    // Gains table for the quality filter: total-order decile cut,
    // per-decile junk capture in exact integer basis points.
    "q_decile_lift" -> ((s: SparkSession, d: String) => graft.text.DecileLift.qDecileLift(s, d)),
    // The 100 TB gains table: sketch cut points at ntile's own
    // boundary ranks + a broadcast bucket join — no global sort;
    // sized so the cut is EXACT at verify SF (same oracle as exact).
    "q_decile_lift_approx" -> ((s: SparkSession, d: String) => graft.text.DecileLift.qDecileLiftApprox(s, d)),
    // Benchmark decontamination: 8-gram collision scan of the corpus
    // against a probe set; planted contaminated docs must show
    // n_hit_docs >= 2 / leaked=true per the arithmetic planting rule.
    "corpus_decontaminate" -> ((s: SparkSession, d: String) => graft.text.Decontaminate.decontaminate(s, d)),
    "corpus_pack" -> ((s: SparkSession, d: String) => graft.text.CorpusShard.pack(s, d)),
    // Sequence packing with document SPLITTING: the concatenated token
    // stream cut into fixed-capacity training sequences — offsets via
    // a two-level distributed prefix sum, span histogram out.
    "corpus_seqpack" -> ((s: SparkSession, d: String) => graft.text.SeqPack.corpusSeqPack(s, d)),
    // The dataloader-consumable span assignment: one row per
    // (doc, sequence) span, reassembly invariants spec-pinned.
    "corpus_seqpack_manifest" -> ((s: SparkSession, d: String) => graft.text.SeqPack.seqPackManifest(s, d)),
    // physical shard write + read-back: the census of what was WRITTEN
    // must equal the manifest — same oracle SQL as corpus_pack, so a
    // dropped row, a partition-key mixup, or a lossy type round-trip
    // through the partitioned layout breaks the hash.
    "corpus_pack_write" -> ((s: SparkSession, d: String) => graft.text.CorpusShard.writeShards(s, d)),
    "corpus_split" -> ((s: SparkSession, d: String) => graft.text.CorpusShard.split(s, d)),
    // Mixture rebalance: downsample strata to a target language mix
    // (limiting stratum kept whole) via the split LCG — achievable
    // total, rates, kept counts and realized shares all reproduced by
    // the oracle's integer arithmetic.
    // Token-weighted rebalance: uniform TOKEN mixture (budget = the
    // smallest source), deterministic doc_id-ordered prefixes.
    "corpus_mix_tokens" -> ((s: SparkSession, d: String) => graft.text.TokenMix.corpusMixTokens(s, d)),
    // Weighted token targets: integer parts w_s, T = min(total*P div w),
    // per-source budget w*T div P — realized share_bp tracks w/P.
    "corpus_mix_tokens_weighted" -> ((s: SparkSession, d: String) => graft.text.TokenMix.corpusMixTokensWeighted(s, d)),
    // Deterministic systematic ∝-token sampling: pick ⟺ the doc's
    // cumulative-weight interval crosses a multiple of W/K — exact
    // integers, inclusion probability ∝ tokens, ≤ K picks per source.
    "corpus_sample_tokens" -> ((s: SparkSession, d: String) => graft.text.TokenSample.corpusSampleTokens(s, d)),
    "corpus_mix" -> ((s: SparkSession, d: String) => graft.text.CorpusMix.mix(s, d)),
    // Upsampling mixture: T = max(n/w) anchors the most over-represented
    // stratum at exactly 1 epoch and repeats every other one r>=1 times
    // (floor(r) full deterministic epoch copies + LCG-thinned fraction).
    "corpus_mix_up" -> ((s: SparkSession, d: String) => graft.text.CorpusMix.mixUp(s, d)),
    // §2d — streaming
    "stream_agg" -> ((s: SparkSession, d: String) => EventStream.runBounded(s, d)),
    "stream_sessionize" -> ((s: SparkSession, d: String) => EventStream.sessionizeBatch(s, d)),
    "stream_dedup" -> ((s: SparkSession, d: String) => graft.streaming.DocStream.runDedupBounded(s, d)),
    // Bounded-state dedup under late arrivals: dropDuplicatesWithinWatermark
    // over a 3-batch planted feed — in-batch dups dropped, below-watermark
    // replays dropped, past-eviction re-emissions re-admitted (the
    // eviction witness). State ∝ keys-per-lateness-window, not history.
    "stream_dedup_watermark" -> ((s: SparkSession, d: String) => graft.streaming.WatermarkDedup.runDedupWatermarkBounded(s, d)),
    // Scrub on the ingest path: stateless per-doc audit inside the
    // micro-batch, rollup over the sink; bounded input == batch scrub,
    // so the oracle is the SAME SQL as text_pii_scrub.
    "stream_pii_scrub" -> ((s: SparkSession, d: String) => graft.streaming.DocStream.runScrubBounded(s, d)),
    "stream_join" -> ((s: SparkSession, d: String) => EventStream.runEnrichJoinBounded(s, d)),
    // Watermarked stream-STREAM join: views x purchases within 1 hour,
    // state bounded by watermark + time-range condition on both sides;
    // bounded replay == the batch self-join.
    "stream_stream_join" -> ((s: SparkSession, d: String) => EventStream.runAttributionBounded(s, d)),
    // LEFT-OUTER stream-stream join: null-padded unmatched views emit
    // when the global watermark passes their match horizon; parity is
    // over the watermark-decided region only (see attributionJoinOuter).
    "stream_stream_outer" -> ((s: SparkSession, d: String) => EventStream.runAttributionOuterBounded(s, d)),
    // FULL outer stream-stream join: null-padded rows from BOTH sides
    // on watermark expiry; decided-region rollup counts pairs,
    // view-only and purchase-only padding per user.
    "stream_stream_full" -> ((s: SparkSession, d: String) => EventStream.runAttributionFullBounded(s, d)),
    "stream_user_stats" -> ((s: SparkSession, d: String) => EventStream.runUserStatsBounded(s, d)),
    // the same per-user custom state on Spark 4's transformWithState
    // (typed ValueState + TTL, RocksDB store) — must converge to the
    // identical batch aggregate.
    "stream_user_stats_tws" -> ((s: SparkSession, d: String) => UserStatsTws.runBounded(s, d)),
    // the TIMER leg of the same API: inactivity-closed sessions via
    // ListState + per-key processing-time timers; timers decide WHEN
    // rows emit, never WHAT — census equals the batch aggregate.
    "stream_inactivity_tws" -> ((s: SparkSession, d: String) => InactivityTws.runBounded(s, d)),
    // the MAP-STATE leg: per-user event-type counters as individual
    // store entries (per-batch work ∝ types touched, not history);
    // TimeMode.None, so AvailableNow terminates normally.
    "stream_type_census_tws" -> ((s: SparkSession, d: String) => TypeCensusTws.runBounded(s, d)),
    // the EVENT-TIME leg: gap sessions closed by watermark-driven
    // timers — replay-deterministic where ProcessingTime is not;
    // decided-region census equals the batch lag-rule sessionization
    // under the same cutoff literal.
    "stream_sessions_etime" -> ((s: SparkSession, d: String) => EventTimeSessionsTws.runBounded(s, d)),
    // Streaming ordered funnel (custom state machine); must converge
    // to the batch chain, so it shares q_funnel's oracle.
    "stream_funnel" -> ((s: SparkSession, d: String) => EventStream.runFunnelBounded(s, d)),
    // Streaming ANN lookup (vector-serving topology): static
    // LSH-bucketed index, probe stream answered per micro-batch by a
    // stream-static bucket join + exact re-rank, file-sink appended;
    // noised-probe top-1 contract + chunked (≥ 2 micro-batch) pin.
    "stream_ann" -> ((s: SparkSession, d: String) => AnnStream.runAnnTop1Bounded(s, d)),
    // Streaming ingest of a TFRecord shard directory through the
    // graft-tfrecord MicroBatchStream (file-name-set offsets,
    // maxFilesPerTrigger admission): per-language census converges to
    // the batch census of the original table.
    "stream_tfrecord" -> ((s: SparkSession, d: String) => TfRecordStream.streamTfRecord(s, d)),
    // Streaming WRITE of the trainer hand-off: stream in -> curate ->
    // TFRecord shards out EXACTLY-ONCE (per-batch manifests over the
    // staged-rename batch write; replayed batch ids are no-ops);
    // census from the read-back of the sink's committed files.
    "stream_tfrecord_sink" -> ((s: SparkSession, d: String) => graft.streaming.TfRecordSink.streamTfRecordSink(s, d)),
    // Streaming ingest of WebDataset tar shards — the PyTorch-format
    // twin of stream_tfrecord, driving the SHARED FileSetMicroBatch
    // machinery (name-set offsets, compaction, admission control).
    "stream_webdataset" -> ((s: SparkSession, d: String) => graft.streaming.WdsStream.streamWebdataset(s, d))
  )

  // DuckDB-dialect equivalents. Notes:
  //  - integer-sum results are CAST to BIGINT (DuckDB sums ints to
  //    HUGEINT) and rank/size results to INTEGER to mirror Spark types;
  //  - list lambdas use 1-based indices; `s[1]`/`s[2]` unpack list_zip;
  //  - doubles are rounded identically on both sides.
  /** Shared by text_pii_scrub (batch) and stream_pii_scrub (bounded
    * stream): the audit numbers must be identical.
    */
  private val PiiScrubOracle: String =
    """WITH planted AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id,
        |    text || CASE doc_id % 4
        |      WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |      WHEN 1 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.' || CAST((doc_id // 7) % 200 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR)
        |      WHEN 2 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      ELSE ' ssn ' || lpad(CAST(doc_id % 900 + 100 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 90 + 10 AS VARCHAR), 2, '0') || '-' || lpad(CAST(doc_id % 9000 + 1000 AS VARCHAR), 4, '0')
        |    END AS text
        |  FROM documents WHERE doc_id % 5 = 0
        |), c AS (
        |  SELECT text,
        |    length(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS m_email,
        |    length(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS m_ipv4,
        |    length(regexp_extract_all(text, '\+1-\d{3}-\d{4}')) AS m_phone,
        |    length(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS m_ssn,
        |    length(text) - length(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')) AS d_email,
        |    length(text) - length(regexp_replace(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS d_ipv4,
        |    length(text) - length(regexp_replace(text, '\+1-\d{3}-\d{4}', '<PHONE>', 'g')) AS d_phone,
        |    length(text) - length(regexp_replace(text, '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g')) AS d_ssn,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |      '\+1-\d{3}-\d{4}', '<PHONE>', 'g'),
        |      '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS red
        |  FROM planted
        |)
        |SELECT 'email' AS category, CAST(sum(m_email) AS BIGINT) AS n_matches,
        |  CAST(sum(CASE WHEN m_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
        |  CAST(sum(d_email) AS BIGINT) AS n_chars_redacted,
        |  CAST(sum(length(regexp_extract_all(red, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS n_residual FROM c
        |UNION ALL
        |SELECT 'ipv4', CAST(sum(m_ipv4) AS BIGINT), CAST(sum(CASE WHEN m_ipv4 > 0 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(sum(d_ipv4) AS BIGINT), CAST(sum(length(regexp_extract_all(red, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))) AS BIGINT) FROM c
        |UNION ALL
        |SELECT 'phone', CAST(sum(m_phone) AS BIGINT), CAST(sum(CASE WHEN m_phone > 0 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(sum(d_phone) AS BIGINT), CAST(sum(length(regexp_extract_all(red, '\+1-\d{3}-\d{4}'))) AS BIGINT) FROM c
        |UNION ALL
        |SELECT 'ssn', CAST(sum(m_ssn) AS BIGINT), CAST(sum(CASE WHEN m_ssn > 0 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(sum(d_ssn) AS BIGINT), CAST(sum(length(regexp_extract_all(red, '\b\d{3}-\d{2}-\d{4}\b'))) AS BIGINT) FROM c
        |ORDER BY category""".stripMargin

  /** Shared by q_funnel and stream_funnel: the batch window chain and
    * the streaming state machine must produce the identical row.
    */
  private val FunnelOracle =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS te FROM events),
      |u1 AS (SELECT user_id, min(CASE WHEN event_type = 'signup' THEN te END) AS t1 FROM e GROUP BY 1),
      |u2 AS (SELECT e.user_id, min(te) AS t2 FROM e JOIN u1 USING (user_id)
      |       WHERE event_type = 'view' AND te > t1 AND te <= t1 + 604800000000 GROUP BY 1),
      |u3 AS (SELECT e.user_id, min(te) AS t3 FROM e JOIN u2 USING (user_id)
      |       WHERE event_type = 'purchase' AND te > t2 AND te <= t2 + 604800000000 GROUP BY 1)
      |SELECT (SELECT count(*) FROM u1) AS n_users,
      |  (SELECT count(t1) FROM u1) AS u_signup,
      |  (SELECT count(*) FROM u2) AS u_view,
      |  (SELECT count(*) FROM u3) AS u_purchase,
      |  (SELECT min(t1) FROM u1) AS first_signup_us,
      |  (SELECT max(t3) FROM u3) AS last_purchase_us""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "svm_part_stats" ->
      "SELECT label, count(*) AS n FROM embeddings GROUP BY ROLLUP(label) ORDER BY label NULLS FIRST",
    "svm_partition" ->
      "SELECT CAST(vec_id % 8 AS INTEGER) AS subset, label, count(*) AS n FROM embeddings GROUP BY 1, 2 ORDER BY 1, 2",
    // sizes are floor(n/k)+1 for the first n%k subsets — a pure function
    // of the total count, verifiable without replaying the seeded RNG.
    "svm_partition_random" ->
      """WITH c AS (SELECT count(*) AS n FROM embeddings)
        |SELECT CAST(i AS INTEGER) AS subset,
        |  CAST(n // 8 + CASE WHEN i < n % 8 THEN 1 ELSE 0 END AS BIGINT) AS n_rows
        |FROM c, (SELECT unnest(generate_series(0, 7)) AS i) ORDER BY 1""".stripMargin,
    // Closed-form SMO pins: every number below is the EXACT analytic
    // max-margin solution (SolverPin.scala derives each by hand); the
    // solver must land on them, not near them.
    // ------------------------------------------------------------------
    // Deterministic SMO training traces, literal-pinned (round-10
    // verdict item 1): the id-sorted group solve makes each trace a
    // pure function of the data (bit-determinism otherwise pinned by
    // svm_solver_pin's KKT literals + svm_model_io's frozen
    // serialization, and re-verified run-to-run at sf0.01 AND sf1
    // before pinning). cascade/bagging/iterative train on embeddings,
    // so their pins carry one VALUES block per corpus, keyed by
    // count(*)*100000 + sum(label) (sf0.001 and sf0.01 share a row
    // count with different content); an unknown corpus selects zero
    // rows = LOUD mismatch. svm_cascade_train_rbf trains on the
    // SF-independent RingData slice — one unconditional block, and its
    // trace was verified IDENTICAL at all four SFs. Regenerate with
    // tools/gen_trace_oracle.py after touching Smo/RingData/ParallelSvm.
    "svm_cascade_train" ->
      """WITH t(stage, layer, subset, n_in, n_sv, metric, sfc) AS (VALUES
      |  ('cascade', 1, 0, -1, 126, 0.0, 50002268),
      |  ('cascade', 1, 1, -1, 126, 0.0, 50002268),
      |  ('cascade', 1, 2, -1, 124, 0.0, 50002268),
      |  ('cascade', 1, 3, -1, 124, 0.0, 50002268),
      |  ('cascade', 2, 0, -1, 252, 0.0, 50002268),
      |  ('cascade', 2, 1, -1, 248, 0.0, 50002268),
      |  ('cascade', 3, 0, -1, 500, 0.0, 50002268),
      |  ('cascade-final', -1, -1, -1, -1, 0.4, 50002268),
      |  ('cascade-final', 4, 0, 500, 500, 0.0, 50002268),
      |  ('cascade', 1, 0, -1, 126, 0.0, 50002270),
      |  ('cascade', 1, 1, -1, 126, 0.0, 50002270),
      |  ('cascade', 1, 2, -1, 124, 0.0, 50002270),
      |  ('cascade', 1, 3, -1, 124, 0.0, 50002270),
      |  ('cascade', 2, 0, -1, 252, 0.0, 50002270),
      |  ('cascade', 2, 1, -1, 248, 0.0, 50002270),
      |  ('cascade', 3, 0, -1, 500, 0.0, 50002270),
      |  ('cascade-final', -1, -1, -1, -1, 0.468, 50002270),
      |  ('cascade-final', 4, 0, 500, 499, 0.0, 50002270),
      |  ('cascade', 1, 0, -1, 500, 0.0, 200009063),
      |  ('cascade', 1, 1, -1, 500, 0.0, 200009063),
      |  ('cascade', 1, 2, -1, 500, 0.0, 200009063),
      |  ('cascade', 1, 3, -1, 500, 0.0, 200009063),
      |  ('cascade', 2, 0, -1, 1000, 0.0, 200009063),
      |  ('cascade', 2, 1, -1, 997, 0.0, 200009063),
      |  ('cascade', 3, 0, -1, 1994, 0.0, 200009063),
      |  ('cascade-final', -1, -1, -1, -1, 0.2275, 200009063),
      |  ('cascade-final', 4, 0, 1994, 1990, 0.0, 200009063),
      |  ('cascade', 1, 0, -1, 4602, 0.0, 2000090630),
      |  ('cascade', 1, 1, -1, 4604, 0.0, 2000090630),
      |  ('cascade', 1, 2, -1, 4575, 0.0, 2000090630),
      |  ('cascade', 1, 3, -1, 4577, 0.0, 2000090630),
      |  ('cascade', 2, 0, -1, 9011, 0.0, 2000090630),
      |  ('cascade', 2, 1, -1, 8941, 0.0, 2000090630),
      |  ('cascade', 3, 0, -1, 17817, 0.0, 2000090630),
      |  ('cascade-final', -1, -1, -1, -1, 0.1971, 2000090630),
      |  ('cascade-final', 4, 0, 17817, 17760, 0.0, 2000090630))
      |SELECT stage, CAST(layer AS INTEGER) AS layer, CAST(subset AS INTEGER) AS subset,
      |  CAST(n_in AS BIGINT) AS n_in, CAST(n_sv AS BIGINT) AS n_sv, CAST(metric AS DOUBLE) AS metric
      |FROM t
      |WHERE sfc = (SELECT count(*)*100000 + sum(label) FROM embeddings)""".stripMargin,
    "svm_bagging_train" ->
      """WITH t(stage, layer, subset, n_in, n_sv, metric, sfc) AS (VALUES
      |  ('bagging', 1, 0, 63, 63, 0.0, 50002268),
      |  ('bagging', 1, 1, 63, 63, 0.0, 50002268),
      |  ('bagging', 1, 2, 63, 63, 0.0, 50002268),
      |  ('bagging', 1, 3, 63, 63, 0.0, 50002268),
      |  ('bagging', 1, 4, 62, 62, 0.0, 50002268),
      |  ('bagging', 1, 5, 62, 62, 0.0, 50002268),
      |  ('bagging', 1, 6, 62, 62, 0.0, 50002268),
      |  ('bagging', 1, 7, 62, 62, 0.0, 50002268),
      |  ('bagging-ensemble', -1, -1, 500, -1, 0.262, 50002268),
      |  ('bagging', 1, 0, 63, 63, 0.0, 50002270),
      |  ('bagging', 1, 1, 63, 63, 0.0, 50002270),
      |  ('bagging', 1, 2, 63, 63, 0.0, 50002270),
      |  ('bagging', 1, 3, 63, 63, 0.0, 50002270),
      |  ('bagging', 1, 4, 62, 62, 0.0, 50002270),
      |  ('bagging', 1, 5, 62, 62, 0.0, 50002270),
      |  ('bagging', 1, 6, 62, 62, 0.0, 50002270),
      |  ('bagging', 1, 7, 62, 62, 0.0, 50002270),
      |  ('bagging-ensemble', -1, -1, 500, -1, 0.27, 50002270),
      |  ('bagging', 1, 0, 250, 250, 0.0, 200009063),
      |  ('bagging', 1, 1, 250, 250, 0.0, 200009063),
      |  ('bagging', 1, 2, 250, 250, 0.0, 200009063),
      |  ('bagging', 1, 3, 250, 250, 0.0, 200009063),
      |  ('bagging', 1, 4, 250, 250, 0.0, 200009063),
      |  ('bagging', 1, 5, 250, 250, 0.0, 200009063),
      |  ('bagging', 1, 6, 250, 250, 0.0, 200009063),
      |  ('bagging', 1, 7, 250, 250, 0.0, 200009063),
      |  ('bagging-ensemble', -1, -1, 2000, -1, 0.2135, 200009063),
      |  ('bagging', 1, 0, 2500, 2280, 0.0, 2000090630),
      |  ('bagging', 1, 1, 2500, 2322, 0.0, 2000090630),
      |  ('bagging', 1, 2, 2500, 2298, 0.0, 2000090630),
      |  ('bagging', 1, 3, 2500, 2306, 0.0, 2000090630),
      |  ('bagging', 1, 4, 2500, 2300, 0.0, 2000090630),
      |  ('bagging', 1, 5, 2500, 2275, 0.0, 2000090630),
      |  ('bagging', 1, 6, 2500, 2320, 0.0, 2000090630),
      |  ('bagging', 1, 7, 2500, 2257, 0.0, 2000090630),
      |  ('bagging-ensemble', -1, -1, 20000, -1, 0.21665, 2000090630))
      |SELECT stage, CAST(layer AS INTEGER) AS layer, CAST(subset AS INTEGER) AS subset,
      |  CAST(n_in AS BIGINT) AS n_in, CAST(n_sv AS BIGINT) AS n_sv, CAST(metric AS DOUBLE) AS metric
      |FROM t
      |WHERE sfc = (SELECT count(*)*100000 + sum(label) FROM embeddings)""".stripMargin,
    "svm_iterative_train" ->
      """WITH t(stage, layer, subset, n_in, n_sv, metric, sfc) AS (VALUES
      |  ('iterative', 1, 0, 63, 63, 20.0, 50002268),
      |  ('iterative', 1, 1, 63, 63, 9.0, 50002268),
      |  ('iterative', 1, 2, 63, 63, 9.0, 50002268),
      |  ('iterative', 1, 3, 63, 63, 2.0, 50002268),
      |  ('iterative', 1, 4, 62, 62, 18.0, 50002268),
      |  ('iterative', 1, 5, 62, 62, 10.0, 50002268),
      |  ('iterative', 1, 6, 62, 62, 7.0, 50002268),
      |  ('iterative', 1, 7, 62, 62, 13.0, 50002268),
      |  ('iterative', 2, 0, 500, 0, 300.0, 50002268),
      |  ('iterative', 2, 1, 500, 0, 300.0, 50002268),
      |  ('iterative', 2, 2, 500, 0, 300.0, 50002268),
      |  ('iterative', 2, 3, 500, 0, 300.0, 50002268),
      |  ('iterative', 2, 4, 500, 0, 300.0, 50002268),
      |  ('iterative', 2, 5, 500, 0, 300.0, 50002268),
      |  ('iterative', 2, 6, 500, 0, 300.0, 50002268),
      |  ('iterative', 2, 7, 500, 0, 300.0, 50002268),
      |  ('iterative-round', 1, -1, 500, -1, 88.0, 50002268),
      |  ('iterative-round', 2, -1, 500, -1, 2400.0, 50002268),
      |  ('iterative', 1, 0, 63, 63, 12.0, 50002270),
      |  ('iterative', 1, 1, 63, 63, 11.0, 50002270),
      |  ('iterative', 1, 2, 63, 63, 5.0, 50002270),
      |  ('iterative', 1, 3, 63, 63, 7.0, 50002270),
      |  ('iterative', 1, 4, 62, 62, 9.0, 50002270),
      |  ('iterative', 1, 5, 62, 62, 10.0, 50002270),
      |  ('iterative', 1, 6, 62, 62, 8.0, 50002270),
      |  ('iterative', 1, 7, 62, 62, 8.0, 50002270),
      |  ('iterative', 2, 0, 500, 0, 266.0, 50002270),
      |  ('iterative', 2, 1, 500, 0, 266.0, 50002270),
      |  ('iterative', 2, 2, 500, 0, 266.0, 50002270),
      |  ('iterative', 2, 3, 500, 0, 266.0, 50002270),
      |  ('iterative', 2, 4, 500, 0, 266.0, 50002270),
      |  ('iterative', 2, 5, 500, 0, 267.0, 50002270),
      |  ('iterative', 2, 6, 500, 0, 266.0, 50002270),
      |  ('iterative', 2, 7, 500, 0, 266.0, 50002270),
      |  ('iterative-round', 1, -1, 500, -1, 70.0, 50002270),
      |  ('iterative-round', 2, -1, 500, -1, 2129.0, 50002270),
      |  ('iterative', 1, 0, 250, 250, 107.0, 200009063),
      |  ('iterative', 1, 1, 250, 250, 112.0, 200009063),
      |  ('iterative', 1, 2, 250, 250, 101.0, 200009063),
      |  ('iterative', 1, 3, 250, 250, 116.0, 200009063),
      |  ('iterative', 1, 4, 250, 250, 106.0, 200009063),
      |  ('iterative', 1, 5, 250, 250, 104.0, 200009063),
      |  ('iterative', 1, 6, 250, 250, 110.0, 200009063),
      |  ('iterative', 1, 7, 250, 250, 110.0, 200009063),
      |  ('iterative', 2, 0, 2000, 0, 1538.0, 200009063),
      |  ('iterative', 2, 1, 2000, 0, 1538.0, 200009063),
      |  ('iterative', 2, 2, 2000, 0, 1538.0, 200009063),
      |  ('iterative', 2, 3, 2000, 0, 1539.0, 200009063),
      |  ('iterative', 2, 4, 2000, 0, 1538.0, 200009063),
      |  ('iterative', 2, 5, 2000, 0, 1539.0, 200009063),
      |  ('iterative', 2, 6, 2000, 0, 1538.0, 200009063),
      |  ('iterative', 2, 7, 2000, 0, 1539.0, 200009063),
      |  ('iterative-round', 1, -1, 2000, -1, 866.0, 200009063),
      |  ('iterative-round', 2, -1, 2000, -1, 12307.0, 200009063),
      |  ('iterative', 1, 0, 2500, 2280, 771.0, 2000090630),
      |  ('iterative', 1, 1, 2500, 2322, 894.0, 2000090630),
      |  ('iterative', 1, 2, 2500, 2298, 872.0, 2000090630),
      |  ('iterative', 1, 3, 2500, 2306, 929.0, 2000090630),
      |  ('iterative', 1, 4, 2500, 2300, 861.0, 2000090630),
      |  ('iterative', 1, 5, 2500, 2275, 816.0, 2000090630),
      |  ('iterative', 1, 6, 2500, 2320, 872.0, 2000090630),
      |  ('iterative', 1, 7, 2500, 2257, 801.0, 2000090630),
      |  ('iterative', 2, 0, 18578, 216, 15029.0, 2000090630),
      |  ('iterative', 2, 1, 18536, 177, 14984.0, 2000090630),
      |  ('iterative', 2, 2, 18560, 200, 15035.0, 2000090630),
      |  ('iterative', 2, 3, 18552, 189, 15025.0, 2000090630),
      |  ('iterative', 2, 4, 18558, 194, 15019.0, 2000090630),
      |  ('iterative', 2, 5, 18583, 223, 15000.0, 2000090630),
      |  ('iterative', 2, 6, 18538, 177, 15002.0, 2000090630),
      |  ('iterative', 2, 7, 18601, 238, 15048.0, 2000090630),
      |  ('iterative-round', 1, -1, 18358, -1, 6816.0, 2000090630),
      |  ('iterative-round', 2, -1, 19972, -1, 120142.0, 2000090630))
      |SELECT stage, CAST(layer AS INTEGER) AS layer, CAST(subset AS INTEGER) AS subset,
      |  CAST(n_in AS BIGINT) AS n_in, CAST(n_sv AS BIGINT) AS n_sv, CAST(metric AS DOUBLE) AS metric
      |FROM t
      |WHERE sfc = (SELECT count(*)*100000 + sum(label) FROM embeddings)""".stripMargin,
    "svm_cascade_train_rbf" ->
      """WITH t(stage, layer, subset, n_in, n_sv, metric) AS (VALUES
      |  ('cascade', 1, 0, -1, 157, 0.0),
      |  ('cascade', 1, 1, -1, 150, 0.0),
      |  ('cascade', 2, 0, -1, 121, 0.0),
      |  ('cascade-final', -1, -1, -1, -1, 1.0),
      |  ('cascade-final', 3, 0, 121, 74, 0.0))
      |SELECT stage, CAST(layer AS INTEGER) AS layer, CAST(subset AS INTEGER) AS subset,
      |  CAST(n_in AS BIGINT) AS n_in, CAST(n_sv AS BIGINT) AS n_sv, CAST(metric AS DOUBLE) AS metric
      |FROM t""".stripMargin,
    "svm_solver_pin" ->
      """SELECT * FROM (VALUES
        |  ('p1_sym', 0, 1, CAST(0.5 AS DOUBLE), true, CAST(0.0 AS DOUBLE), CAST(0.5 AS DOUBLE)),
        |  ('p1_sym', 1, -1, CAST(0.5 AS DOUBLE), true, CAST(0.0 AS DOUBLE), CAST(0.5 AS DOUBLE)),
        |  ('p2_offset', 0, 1, CAST(0.125 AS DOUBLE), true, CAST(1.0 AS DOUBLE), CAST(0.125 AS DOUBLE)),
        |  ('p2_offset', 1, -1, CAST(0.125 AS DOUBLE), true, CAST(1.0 AS DOUBLE), CAST(0.125 AS DOUBLE)),
        |  ('p3_bounded', 0, 1, CAST(0.4 AS DOUBLE), true, CAST(0.0 AS DOUBLE), CAST(0.72 AS DOUBLE)),
        |  ('p3_bounded', 1, -1, CAST(0.4 AS DOUBLE), true, CAST(0.0 AS DOUBLE), CAST(0.72 AS DOUBLE)),
        |  ('p4_interior', 0, 1, CAST(0.125 AS DOUBLE), true, CAST(1.0 AS DOUBLE), CAST(0.125 AS DOUBLE)),
        |  ('p4_interior', 1, 1, CAST(0.0 AS DOUBLE), false, CAST(1.0 AS DOUBLE), CAST(0.125 AS DOUBLE)),
        |  ('p4_interior', 2, -1, CAST(0.125 AS DOUBLE), true, CAST(1.0 AS DOUBLE), CAST(0.125 AS DOUBLE)),
        |  ('p4_interior', 3, -1, CAST(0.0 AS DOUBLE), false, CAST(1.0 AS DOUBLE), CAST(0.125 AS DOUBLE))
        |) AS t(problem, point_id, y, alpha, is_sv, rho, dual_obj)
        |ORDER BY problem, point_id""".stripMargin,
    // Literal pin of the deterministic CV table (StrictMath rings +
    // deterministic SMO): a solver, fold-assignment, or noise-rule
    // change moves these rows. sf-independent by construction.
    "svm_grid_search" ->
      """SELECT * FROM (VALUES
        |  (CAST(0.1 AS DOUBLE), CAST(0.001 AS DOUBLE), CAST(300 AS BIGINT), CAST(155 AS BIGINT), false),
        |  (CAST(0.1 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(300 AS BIGINT), CAST(29 AS BIGINT), false),
        |  (CAST(0.1 AS DOUBLE), CAST(50.0 AS DOUBLE), CAST(300 AS BIGINT), CAST(99 AS BIGINT), false),
        |  (CAST(1.0 AS DOUBLE), CAST(0.001 AS DOUBLE), CAST(300 AS BIGINT), CAST(155 AS BIGINT), false),
        |  (CAST(1.0 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(300 AS BIGINT), CAST(6 AS BIGINT), false),
        |  (CAST(1.0 AS DOUBLE), CAST(50.0 AS DOUBLE), CAST(300 AS BIGINT), CAST(3 AS BIGINT), false),
        |  (CAST(100.0 AS DOUBLE), CAST(0.001 AS DOUBLE), CAST(300 AS BIGINT), CAST(53 AS BIGINT), false),
        |  (CAST(100.0 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(300 AS BIGINT), CAST(2 AS BIGINT), true),
        |  (CAST(100.0 AS DOUBLE), CAST(50.0 AS DOUBLE), CAST(300 AS BIGINT), CAST(3 AS BIGINT), false)
        |) AS t(c, gamma, n_test, cv_errs, best)
        |ORDER BY c, gamma""".stripMargin,
    // Identical IEEE op order on both sides: cast→sub→mul→div→sub,
    // then round(6) — doubles match bit-for-bit, no tolerance needed.
    "svm_scale" ->
      """WITH ex AS (
        |  SELECT vec_id, CAST(i - 1 AS INT) AS dim, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) t
        |), b AS (
        |  SELECT dim, min(x) AS lo, max(x) AS hi FROM ex GROUP BY 1
        |)
        |SELECT e.vec_id, e.dim, round(e.x, 6) AS x,
        |  round(CASE WHEN b.hi = b.lo THEN 0.0
        |    ELSE (e.x - b.lo) * 2.0 / (b.hi - b.lo) - 1.0 END, 6) AS scaled
        |FROM ex e JOIN b USING (dim)
        |WHERE e.vec_id % 50 = 0
        |ORDER BY e.vec_id, e.dim""".stripMargin,
    "svm_predict" ->
      """WITH s AS (
        |  SELECT vec_id, CAST(c AS INTEGER) AS c,
        |    list_sum(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * CAST(((c * 64 + (i - 1)) * 2654435761) % 1000 - 500 AS DOUBLE))) AS score
        |  FROM embeddings, (SELECT unnest(generate_series(0, 9)) AS c)
        |), b AS (
        |  SELECT vec_id, c AS pred, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, c) AS rn FROM s
        |)
        |SELECT pred, count(*) AS n FROM b WHERE rn = 1 GROUP BY pred ORDER BY pred""".stripMargin,
    // Held-out evaluation pin: like the training traces, every
    // number is a pure function of the corpus (id-sorted SMO,
    // deterministic split/vote), literal-pinned per corpus via the
    // embeddings composite key; an unknown corpus selects zero rows
    // = loud mismatch. Regenerate alongside the trace pins after
    // touching Smo/ParallelSvm (tools/gen_trace_oracle.py notes).
    "svm_holdout_eval" ->
      """WITH t(algo, split, label, n, n_hit, sfc) AS (VALUES
      |  ('bagging', 'holdout', 0, 23, 17, 50002268),
      |  ('bagging', 'holdout', 1, 20, 5, 50002268),
      |  ('bagging', 'holdout', 2, 33, 1, 50002268),
      |  ('bagging', 'holdout', 3, 26, 0, 50002268),
      |  ('bagging', 'holdout', 4, 25, 0, 50002268),
      |  ('bagging', 'holdout', 5, 26, 1, 50002268),
      |  ('bagging', 'holdout', 6, 21, 0, 50002268),
      |  ('bagging', 'holdout', 7, 23, 0, 50002268),
      |  ('bagging', 'holdout', 8, 23, 0, 50002268),
      |  ('bagging', 'holdout', 9, 30, 3, 50002268),
      |  ('bagging', 'train', 0, 33, 30, 50002268),
      |  ('bagging', 'train', 1, 27, 5, 50002268),
      |  ('bagging', 'train', 2, 21, 2, 50002268),
      |  ('bagging', 'train', 3, 17, 0, 50002268),
      |  ('bagging', 'train', 4, 23, 1, 50002268),
      |  ('bagging', 'train', 5, 25, 2, 50002268),
      |  ('bagging', 'train', 6, 21, 5, 50002268),
      |  ('bagging', 'train', 7, 27, 5, 50002268),
      |  ('bagging', 'train', 8, 23, 0, 50002268),
      |  ('bagging', 'train', 9, 33, 21, 50002268),
      |  ('cascade', 'holdout', 0, 23, 5, 50002268),
      |  ('cascade', 'holdout', 1, 20, 2, 50002268),
      |  ('cascade', 'holdout', 2, 33, 0, 50002268),
      |  ('cascade', 'holdout', 3, 26, 0, 50002268),
      |  ('cascade', 'holdout', 4, 25, 2, 50002268),
      |  ('cascade', 'holdout', 5, 26, 4, 50002268),
      |  ('cascade', 'holdout', 6, 21, 1, 50002268),
      |  ('cascade', 'holdout', 7, 23, 2, 50002268),
      |  ('cascade', 'holdout', 8, 23, 1, 50002268),
      |  ('cascade', 'holdout', 9, 30, 2, 50002268),
      |  ('cascade', 'train', 0, 33, 29, 50002268),
      |  ('cascade', 'train', 1, 27, 15, 50002268),
      |  ('cascade', 'train', 2, 21, 7, 50002268),
      |  ('cascade', 'train', 3, 17, 10, 50002268),
      |  ('cascade', 'train', 4, 23, 9, 50002268),
      |  ('cascade', 'train', 5, 25, 14, 50002268),
      |  ('cascade', 'train', 6, 21, 11, 50002268),
      |  ('cascade', 'train', 7, 27, 20, 50002268),
      |  ('cascade', 'train', 8, 23, 11, 50002268),
      |  ('cascade', 'train', 9, 33, 26, 50002268),
      |  ('bagging', 'holdout', 0, 26, 4, 50002270),
      |  ('bagging', 'holdout', 1, 24, 9, 50002270),
      |  ('bagging', 'holdout', 2, 17, 2, 50002270),
      |  ('bagging', 'holdout', 3, 29, 4, 50002270),
      |  ('bagging', 'holdout', 4, 25, 0, 50002270),
      |  ('bagging', 'holdout', 5, 23, 0, 50002270),
      |  ('bagging', 'holdout', 6, 22, 0, 50002270),
      |  ('bagging', 'holdout', 7, 23, 0, 50002270),
      |  ('bagging', 'holdout', 8, 26, 1, 50002270),
      |  ('bagging', 'holdout', 9, 35, 0, 50002270),
      |  ('bagging', 'train', 0, 24, 8, 50002270),
      |  ('bagging', 'train', 1, 22, 16, 50002270),
      |  ('bagging', 'train', 2, 30, 10, 50002270),
      |  ('bagging', 'train', 3, 30, 16, 50002270),
      |  ('bagging', 'train', 4, 27, 4, 50002270),
      |  ('bagging', 'train', 5, 21, 1, 50002270),
      |  ('bagging', 'train', 6, 24, 2, 50002270),
      |  ('bagging', 'train', 7, 30, 6, 50002270),
      |  ('bagging', 'train', 8, 23, 1, 50002270),
      |  ('bagging', 'train', 9, 19, 2, 50002270),
      |  ('cascade', 'holdout', 0, 26, 1, 50002270),
      |  ('cascade', 'holdout', 1, 24, 5, 50002270),
      |  ('cascade', 'holdout', 2, 17, 3, 50002270),
      |  ('cascade', 'holdout', 3, 29, 6, 50002270),
      |  ('cascade', 'holdout', 4, 25, 3, 50002270),
      |  ('cascade', 'holdout', 5, 23, 0, 50002270),
      |  ('cascade', 'holdout', 6, 22, 0, 50002270),
      |  ('cascade', 'holdout', 7, 23, 1, 50002270),
      |  ('cascade', 'holdout', 8, 26, 0, 50002270),
      |  ('cascade', 'holdout', 9, 35, 1, 50002270),
      |  ('cascade', 'train', 0, 24, 16, 50002270),
      |  ('cascade', 'train', 1, 22, 12, 50002270),
      |  ('cascade', 'train', 2, 30, 19, 50002270),
      |  ('cascade', 'train', 3, 30, 25, 50002270),
      |  ('cascade', 'train', 4, 27, 17, 50002270),
      |  ('cascade', 'train', 5, 21, 6, 50002270),
      |  ('cascade', 'train', 6, 24, 18, 50002270),
      |  ('cascade', 'train', 7, 30, 20, 50002270),
      |  ('cascade', 'train', 8, 23, 11, 50002270),
      |  ('cascade', 'train', 9, 19, 7, 50002270),
      |  ('bagging', 'holdout', 0, 104, 26, 200009063),
      |  ('bagging', 'holdout', 1, 86, 9, 200009063),
      |  ('bagging', 'holdout', 2, 118, 16, 200009063),
      |  ('bagging', 'holdout', 3, 104, 10, 200009063),
      |  ('bagging', 'holdout', 4, 100, 5, 200009063),
      |  ('bagging', 'holdout', 5, 80, 9, 200009063),
      |  ('bagging', 'holdout', 6, 83, 8, 200009063),
      |  ('bagging', 'holdout', 7, 107, 6, 200009063),
      |  ('bagging', 'holdout', 8, 111, 7, 200009063),
      |  ('bagging', 'holdout', 9, 107, 1, 200009063),
      |  ('bagging', 'train', 0, 95, 52, 200009063),
      |  ('bagging', 'train', 1, 96, 18, 200009063),
      |  ('bagging', 'train', 2, 100, 20, 200009063),
      |  ('bagging', 'train', 3, 97, 25, 200009063),
      |  ('bagging', 'train', 4, 96, 12, 200009063),
      |  ('bagging', 'train', 5, 109, 31, 200009063),
      |  ('bagging', 'train', 6, 111, 31, 200009063),
      |  ('bagging', 'train', 7, 104, 24, 200009063),
      |  ('bagging', 'train', 8, 107, 13, 200009063),
      |  ('bagging', 'train', 9, 85, 5, 200009063),
      |  ('cascade', 'holdout', 0, 104, 9, 200009063),
      |  ('cascade', 'holdout', 1, 86, 3, 200009063),
      |  ('cascade', 'holdout', 2, 118, 15, 200009063),
      |  ('cascade', 'holdout', 3, 104, 7, 200009063),
      |  ('cascade', 'holdout', 4, 100, 6, 200009063),
      |  ('cascade', 'holdout', 5, 80, 11, 200009063),
      |  ('cascade', 'holdout', 6, 83, 4, 200009063),
      |  ('cascade', 'holdout', 7, 107, 8, 200009063),
      |  ('cascade', 'holdout', 8, 111, 13, 200009063),
      |  ('cascade', 'holdout', 9, 107, 0, 200009063),
      |  ('cascade', 'train', 0, 95, 22, 200009063),
      |  ('cascade', 'train', 1, 96, 19, 200009063),
      |  ('cascade', 'train', 2, 100, 32, 200009063),
      |  ('cascade', 'train', 3, 97, 26, 200009063),
      |  ('cascade', 'train', 4, 96, 34, 200009063),
      |  ('cascade', 'train', 5, 109, 47, 200009063),
      |  ('cascade', 'train', 6, 111, 31, 200009063),
      |  ('cascade', 'train', 7, 104, 44, 200009063),
      |  ('cascade', 'train', 8, 107, 30, 200009063),
      |  ('cascade', 'train', 9, 85, 18, 200009063),
      |  ('bagging', 'holdout', 0, 1040, 214, 2000090630),
      |  ('bagging', 'holdout', 1, 860, 134, 2000090630),
      |  ('bagging', 'holdout', 2, 1180, 193, 2000090630),
      |  ('bagging', 'holdout', 3, 1040, 111, 2000090630),
      |  ('bagging', 'holdout', 4, 1000, 62, 2000090630),
      |  ('bagging', 'holdout', 5, 800, 65, 2000090630),
      |  ('bagging', 'holdout', 6, 830, 40, 2000090630),
      |  ('bagging', 'holdout', 7, 1070, 57, 2000090630),
      |  ('bagging', 'holdout', 8, 1110, 65, 2000090630),
      |  ('bagging', 'holdout', 9, 1070, 19, 2000090630),
      |  ('bagging', 'train', 0, 950, 486, 2000090630),
      |  ('bagging', 'train', 1, 960, 372, 2000090630),
      |  ('bagging', 'train', 2, 1000, 381, 2000090630),
      |  ('bagging', 'train', 3, 970, 311, 2000090630),
      |  ('bagging', 'train', 4, 960, 213, 2000090630),
      |  ('bagging', 'train', 5, 1090, 291, 2000090630),
      |  ('bagging', 'train', 6, 1110, 214, 2000090630),
      |  ('bagging', 'train', 7, 1040, 211, 2000090630),
      |  ('bagging', 'train', 8, 1070, 122, 2000090630),
      |  ('bagging', 'train', 9, 850, 58, 2000090630),
      |  ('cascade', 'holdout', 0, 1040, 102, 2000090630),
      |  ('cascade', 'holdout', 1, 860, 69, 2000090630),
      |  ('cascade', 'holdout', 2, 1180, 145, 2000090630),
      |  ('cascade', 'holdout', 3, 1040, 104, 2000090630),
      |  ('cascade', 'holdout', 4, 1000, 110, 2000090630),
      |  ('cascade', 'holdout', 5, 800, 100, 2000090630),
      |  ('cascade', 'holdout', 6, 830, 79, 2000090630),
      |  ('cascade', 'holdout', 7, 1070, 89, 2000090630),
      |  ('cascade', 'holdout', 8, 1110, 98, 2000090630),
      |  ('cascade', 'holdout', 9, 1070, 32, 2000090630),
      |  ('cascade', 'train', 0, 950, 227, 2000090630),
      |  ('cascade', 'train', 1, 960, 215, 2000090630),
      |  ('cascade', 'train', 2, 1000, 294, 2000090630),
      |  ('cascade', 'train', 3, 970, 290, 2000090630),
      |  ('cascade', 'train', 4, 960, 255, 2000090630),
      |  ('cascade', 'train', 5, 1090, 361, 2000090630),
      |  ('cascade', 'train', 6, 1110, 302, 2000090630),
      |  ('cascade', 'train', 7, 1040, 302, 2000090630),
      |  ('cascade', 'train', 8, 1070, 215, 2000090630),
      |  ('cascade', 'train', 9, 850, 116, 2000090630))
      |SELECT algo, split, CAST(label AS INTEGER) AS label,
      |  CAST(n AS BIGINT) AS n, CAST(n_hit AS BIGINT) AS n_hit,
      |  CAST(n_hit AS DOUBLE) / n AS acc
      |FROM t
      |WHERE sfc = (SELECT count(*)*100000 + sum(label) FROM embeddings)
      |ORDER BY algo, split, label""".stripMargin,
    "svm_evaluate" ->
      """WITH ex AS (
        |  SELECT vec_id, label, unnest(embedding) AS x, unnest(generate_series(1, length(embedding))) AS i FROM embeddings
        |), cent AS (
        |  SELECT label AS clabel, i, avg(CAST(x AS DOUBLE)) AS c FROM ex GROUP BY 1, 2
        |), d AS (
        |  SELECT ex.vec_id, ex.label, cent.clabel,
        |         sum((CAST(ex.x AS DOUBLE) - cent.c) * (CAST(ex.x AS DOUBLE) - cent.c)) AS dist
        |  FROM ex JOIN cent ON ex.i = cent.i GROUP BY 1, 2, 3
        |), b AS (
        |  SELECT vec_id, label, clabel, row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) AS rn FROM d
        |)
        |SELECT label, clabel AS pred, count(*) AS n FROM b WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "svm_kernel_gram" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(exp(-(1.0 / 64.0) * list_sum(list_transform(list_zip(a.embedding, b.embedding), s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)) * (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))))), 6) AS k_rbf,
        |  round(list_sum(list_transform(list_zip(a.embedding, b.embedding), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))), 6) AS k_dot
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1 ORDER BY id_a""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)) / 100.0 AS sum_base_price,
        |  ((sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) + 50) // 100) / 100.0 AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_join" ->
      """SELECT l_orderkey, o_orderdate, ((sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) + 50) // 100) / 100.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_multijoin" ->
      """SELECT r_name, n_name, ((sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) + 50) // 100) / 100.0 AS revenue, count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q6_filter" ->
      "SELECT ((sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT) * CAST(floor(l_discount*100+0.5) AS BIGINT)) + 50) // 100) / 100.0 AS revenue, count(*) AS n_rows FROM lineitem WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24",
    "q_window" ->
      """SELECT o_custkey, o_orderkey, rk FROM (
        |  SELECT o_custkey, o_orderkey, CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk FROM orders
        |) t WHERE rk <= 2 ORDER BY o_custkey, rk""".stripMargin,
    // The melt must land exactly on the direct long-form aggregation.
    "q_unpivot" ->
      """SELECT o_orderpriority, o_orderstatus, sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) / 100.0 AS total
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) / 100.0 AS total, count(*) AS n
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) / 100.0 AS total, count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    // The two marginals + grand total, no cross cells — the sets
    // rollup/cube cannot express.
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) / 100.0 AS total, count(*) AS n
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_events_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, ts, value, event_id, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events
        |), f AS (
        |  SELECT user_id, value,
        |    sum(CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM e
        |), s AS (
        |  SELECT user_id, session_seq, count(*) AS n_events, round(sum(value), 2) AS total_value FROM f GROUP BY 1, 2
        |)
        |SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events, round(sum(total_value), 2) AS total_value
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_semi_anti" ->
      """SELECT kind, n FROM (
        |  SELECT 'with_orders' AS kind, count(*) AS n FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  UNION ALL
        |  SELECT 'without_orders' AS kind, count(*) AS n FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |) t ORDER BY kind""".stripMargin,
    "q_topk_per_group" ->
      """SELECT p_brand, p_partkey, rk FROM (
        |  SELECT p_brand, p_partkey, CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rk FROM part
        |) t WHERE rk <= 3 ORDER BY p_brand, rk, p_partkey""".stripMargin,
    "q_asof_join" ->
      """WITH e AS (SELECT event_id, user_id % 50 AS k, epoch_us(ts) AS t FROM events),
        |o AS (SELECT o_custkey % 50 AS k2, epoch_us(o_orderdate) AS t2, max(o_orderkey) AS okey
        |      FROM orders GROUP BY 1, 2)
        |SELECT k, count(*) AS n_events, count(okey) AS n_matched, max(okey) AS max_okey
        |FROM e ASOF LEFT JOIN o ON e.k = o.k2 AND e.t >= o.t2
        |GROUP BY k ORDER BY k""".stripMargin,
    "q_multi_distinct" -> graft.queries.MultiDistinct.oracleSql,
    "q_distinct_agg" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem""".stripMargin,
    // Tolerance drops the LATEST match when stale; any earlier match is
    // staler still, so ASOF + post-filter == the engine's semantics.
    "q_asof_tolerance" ->
      """WITH e AS (SELECT event_id, user_id % 50 AS k, epoch_us(ts) AS t FROM events),
        |o AS (SELECT o_custkey % 50 AS k2, epoch_us(o_orderdate) AS t2, max(o_orderkey) AS okey
        |      FROM orders GROUP BY 1, 2),
        |j AS (SELECT k, t, t2, okey FROM e ASOF LEFT JOIN o ON e.k = o.k2 AND e.t >= o.t2)
        |SELECT k, count(*) AS n_events,
        |  count(CASE WHEN t - t2 <= CAST(709344000000000 AS BIGINT) THEN okey END) AS n_matched,
        |  max(CASE WHEN t - t2 <= CAST(709344000000000 AS BIGINT) THEN okey END) AS max_okey
        |FROM j GROUP BY k ORDER BY k""".stripMargin,
    // Forward as-of: DuckDB's <= comparator is its native forward
    // direction — different machinery than the negated backward merge,
    // same matches.
    "q_asof_forward" ->
      """WITH v AS (SELECT event_id, user_id AS k, epoch_us(ts) AS t FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id AS k2, epoch_us(ts) AS t2, max(event_id) AS pid
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |j AS (SELECT k, pid FROM v ASOF LEFT JOIN p ON v.k = p.k2 AND v.t <= p.t2)
        |SELECT k % 50 AS cohort, count(*) AS n_views, count(pid) AS n_matched, max(pid) AS max_pid
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_outer_join" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_customer_only,
        |  CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_order_only,
        |  count(CASE WHEN c_custkey IS NOT NULL AND o_orderkey IS NOT NULL THEN 1 END) AS n_matched
        |FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey""".stripMargin,
    "q_percentiles" ->
      """SELECT floor(quantile_cont(l_extendedprice, 0.5) * 100 + 0.5) / 100 AS p50,
        |  floor(quantile_cont(l_extendedprice, 0.9) * 100 + 0.5) / 100 AS p90,
        |  floor(quantile_cont(l_extendedprice, 0.99) * 100 + 0.5) / 100 AS p99,
        |  floor(min(l_extendedprice) * 100 + 0.5) / 100 AS pmin,
        |  floor(max(l_extendedprice) * 100 + 0.5) / 100 AS pmax
        |FROM lineitem""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  sum(CASE WHEN o_orderstatus = 'F' THEN CAST(floor(o_totalprice*100+0.5) AS BIGINT) END) / 100.0 AS total_f,
        |  sum(CASE WHEN o_orderstatus = 'O' THEN CAST(floor(o_totalprice*100+0.5) AS BIGINT) END) / 100.0 AS total_o,
        |  sum(CASE WHEN o_orderstatus = 'P' THEN CAST(floor(o_totalprice*100+0.5) AS BIGINT) END) / 100.0 AS total_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
        |  floor(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100 AS mavg
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    // The engine's SQL surface with registered custom expressions.
    "q_sql_vec" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(CASE WHEN sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0 THEN 0.0
        |    ELSE list_sum(list_transform(list_zip(a.embedding, b.embedding), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) END, 6) AS cosine,
        |  round(list_sum(list_transform(list_zip(a.embedding, b.embedding), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE))), 6) AS dot
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id % 10 = 0
        |ORDER BY id_a""".stripMargin,
    "q_skew_histogram" ->
      """WITH k AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1)
        |SELECT length(bin(cnt)) AS log2_bucket, count(*) AS n_keys,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows, max(cnt) AS max_cnt
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,
    // The engine runs a bucketed sweep (no self-join); the quadratic
    // NOT EXISTS is exactly what an oracle is allowed to be. Pure
    // comparisons on stored values — no float arithmetic to drift.
    "q_skyline" ->
      """SELECT p.p_partkey, p.p_retailprice AS price, CAST(p.p_size AS BIGINT) AS size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice >= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice > p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY price DESC, p.p_partkey""".stripMargin,
    // The engine counts via degree orientation (O(m^1.5) wedge volume);
    // the oracle is the plain ordered 3-way join — same triangles, any
    // algorithm. Wedge sum uses per-term integer division (d·(d−1) is
    // even), so every statistic is exact integer arithmetic; closure is
    // ONE IEEE division, rounded.
    "q_triangle" ->
      """WITH os AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
        |e AS (SELECT a.s AS u, b.s AS v FROM os a JOIN os b ON a.o = b.o AND a.s < b.s
        |      GROUP BY 1, 2 HAVING count(*) >= 5),
        |deg AS (SELECT x, count(*) AS d FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e) t GROUP BY 1),
        |tri AS (SELECT count(*) AS n_triangles FROM e e1
        |        JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
        |        JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
        |SELECT (SELECT count(DISTINCT l_suppkey) FROM lineitem) AS n_suppliers,
        |  (SELECT count(*) FROM e) AS n_edges,
        |  (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
        |  n_triangles,
        |  CASE WHEN (SELECT sum(d * (d - 1) // 2) FROM deg) > 0
        |    THEN round(n_triangles * 3 / (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg), 6)
        |    ELSE 0.0 END AS closure
        |FROM tri""".stripMargin,
    // Five unrolled integer-arithmetic rounds (r0 = 10^12; teleport
    // (3T) div 20; damping (17·x) div 20; contribution r div deg) —
    // BIGINT floor division on positives is identical in both engines,
    // so the fixpoint iterates to the same bits.
    "q_pagerank" ->
      """WITH os AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
        |und AS (SELECT DISTINCT a.s AS u, b.s AS v FROM os a JOIN os b ON a.o = b.o AND a.s < b.s),
        |e AS (SELECT u AS src, v AS dst FROM und UNION ALL SELECT v AS src, u AS dst FROM und),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
        |verts AS (SELECT DISTINCT s FROM os),
        |p0 AS (SELECT s, CAST(1000000000000 AS BIGINT) AS r FROM verts),
        |p1 AS (SELECT v.s, CAST(150000000000 + (17 * COALESCE(i.t, 0)) // 20 AS BIGINT) AS r
        |       FROM verts v LEFT JOIN (SELECT e.dst AS s, CAST(sum(p.r // deg.d) AS BIGINT) AS t
        |         FROM e JOIN p0 p ON p.s = e.src JOIN deg ON deg.src = e.src GROUP BY e.dst) i USING (s)),
        |p2 AS (SELECT v.s, CAST(150000000000 + (17 * COALESCE(i.t, 0)) // 20 AS BIGINT) AS r
        |       FROM verts v LEFT JOIN (SELECT e.dst AS s, CAST(sum(p.r // deg.d) AS BIGINT) AS t
        |         FROM e JOIN p1 p ON p.s = e.src JOIN deg ON deg.src = e.src GROUP BY e.dst) i USING (s)),
        |p3 AS (SELECT v.s, CAST(150000000000 + (17 * COALESCE(i.t, 0)) // 20 AS BIGINT) AS r
        |       FROM verts v LEFT JOIN (SELECT e.dst AS s, CAST(sum(p.r // deg.d) AS BIGINT) AS t
        |         FROM e JOIN p2 p ON p.s = e.src JOIN deg ON deg.src = e.src GROUP BY e.dst) i USING (s)),
        |p4 AS (SELECT v.s, CAST(150000000000 + (17 * COALESCE(i.t, 0)) // 20 AS BIGINT) AS r
        |       FROM verts v LEFT JOIN (SELECT e.dst AS s, CAST(sum(p.r // deg.d) AS BIGINT) AS t
        |         FROM e JOIN p3 p ON p.s = e.src JOIN deg ON deg.src = e.src GROUP BY e.dst) i USING (s)),
        |p5 AS (SELECT v.s, CAST(150000000000 + (17 * COALESCE(i.t, 0)) // 20 AS BIGINT) AS r
        |       FROM verts v LEFT JOIN (SELECT e.dst AS s, CAST(sum(p.r // deg.d) AS BIGINT) AS t
        |         FROM e JOIN p4 p ON p.s = e.src JOIN deg ON deg.src = e.src GROUP BY e.dst) i USING (s))
        |SELECT s AS s_suppkey, r AS rank_scaled FROM p5
        |ORDER BY rank_scaled DESC, s_suppkey LIMIT 10""".stripMargin,
    // The 2%-band booleans are the pinned contract (lgK=14 standard
    // error ≈ 0.8%); the oracle computes only exact counts — sketch
    // internals are engine-specific by nature (q_approx_distinct
    // discipline).
    "q_hll_sketch" ->
      """SELECT event_type AS scope, count(DISTINCT user_id) AS n_exact, TRUE AS approx_ok
        |FROM events GROUP BY 1
        |UNION ALL
        |SELECT '__union', count(DISTINCT user_id), TRUE FROM events
        |ORDER BY scope""".stripMargin,
    // The bitmap VALUES are hash-compared against exact distinct
    // counts — a strict oracle, unlike the sketch tier's band.
    "q_bitmap_distinct" ->
      """SELECT event_type AS scope, count(DISTINCT user_id) AS n_distinct
        |FROM events GROUP BY 1
        |UNION ALL
        |SELECT '__union', count(DISTINCT user_id) FROM events
        |ORDER BY scope""".stripMargin,
    "q_segment_overlap" -> graft.queries.SegmentOverlap.oracleSql,
    // Same strict equality oracle over the sparse-id plant.
    "q_bitmap_sparse" ->
      """WITH e AS (
        |  SELECT event_type,
        |    user_id * 1099511627776 + user_id % 7 AS sid
        |  FROM events
        |)
        |SELECT event_type AS scope, count(DISTINCT sid) AS n_distinct
        |FROM e GROUP BY 1
        |UNION ALL
        |SELECT '__union', count(DISTINCT sid) FROM e
        |ORDER BY scope""".stripMargin,
    // The sharded tier answers the IDENTICAL strict-equality question:
    // exactness must survive the range split.
    "q_bitmap_sharded" ->
      """WITH e AS (
        |  SELECT event_type,
        |    user_id * 1099511627776 + user_id % 7 AS sid
        |  FROM events
        |)
        |SELECT event_type AS scope, count(DISTINCT sid) AS n_distinct
        |FROM e GROUP BY 1
        |UNION ALL
        |SELECT '__union', count(DISTINCT sid) FROM e
        |ORDER BY scope""".stripMargin,
    // Chunked OR-maintenance must converge to the batch census — the
    // same strict oracle as q_bitmap_distinct.
    "stream_bitmap_distinct" ->
      """SELECT event_type AS scope, count(DISTINCT user_id) AS n_distinct
        |FROM events GROUP BY 1
        |UNION ALL
        |SELECT '__union', count(DISTINCT user_id) FROM events
        |ORDER BY scope""".stripMargin,
    // The rescan formulation: semantics, not the plan.
    "q_rolling_distinct" -> graft.queries.RollingDistinct.oracleSql,
    // Chunked HLL-union maintenance: estimates stay inside the same
    // 2% band as the all-at-once sketch (approx_ok hash-pinned).
    "stream_hll_distinct" ->
      """SELECT event_type AS scope, count(DISTINCT user_id) AS n_exact, TRUE AS approx_ok
        |FROM events GROUP BY 1
        |UNION ALL
        |SELECT '__union', count(DISTINCT user_id), TRUE FROM events
        |ORDER BY scope""".stripMargin,
    // Every extracted value recomputed from BASE columns: the
    // construct→parse→traverse→cast round-trip must be exact.
    "q_variant_extract" ->
      """SELECT event_type, user_id % 10 AS seg, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  sum(CAST(floor(value*100+0.5) AS BIGINT)) / 100.0 AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // DuckDB runs the SAME lateral SQL — different decorrelation
    // machinery, same rows.
    "q_lateral_topk" ->
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin,
    // DuckDB runs the SAME correlated scalar-agg SQL — its own
    // decorrelator, same rows (the q_lateral_topk discipline).
    "q_scalar_subquery" -> graft.queries.ScalarSubquery.sql("lineitem", "part"),
    // Same-SQL-text contract for the predicate-subquery class.
    "q_exists_subquery" -> graft.queries.ExistsSubquery.sql("customer", "orders"),
    // Q22 class: the uncorrelated global-scalar + NOT EXISTS text,
    // verbatim in both engines; money as exact integer cents.
    "q_global_scalar" -> graft.queries.GlobalScalar.sql("customer", "orders"),
    // Q2 class: correlated scalar MIN over a multi-table join, one
    // text both engines; min-equality in exact integer cents.
    "q_min_cost_supplier" -> graft.queries.MinCostSupplier.sql(
      "lineitem", "part", "supplier", "nation", "region"),
    // Q15 class: view consumed twice — join input and global MAX in an
    // uncorrelated scalar; revenue in exact integer units.
    "q_top_revenue_view" -> graft.queries.TopRevenueView.sql("lineitem", "supplier"),
    // Q20 class: two-level nested IN containing a correlated scalar
    // aggregate; disjoint date windows keep the predicate selective.
    "q_nested_in_scalar" -> graft.queries.NestedInScalar.sql(
      "lineitem", "part", "supplier", "nation"),
    // Q7 class: disjunctive cross-nation predicate over six tables.
    "q_volume_shipping" -> graft.queries.VolumeShipping.sql(
      "lineitem", "orders", "customer", "supplier", "nation"),
    // Q8 class: eight-table conditional-ratio market share.
    "q_market_share" -> graft.queries.MarketShare.sql(
      "lineitem", "orders", "customer", "supplier", "part", "nation", "region"),
    // Q11 class: fraction-of-own-total filter, integer cross-multiplied.
    "q_important_stock" -> graft.queries.ImportantStock.sql(
      "lineitem", "supplier", "nation"),
    // Q19 class: both engines factor the same disjunction.
    "q_disjunctive_join" -> graft.queries.DisjunctiveJoin.sql("lineitem", "part"),
    // Q12 class: integer CASE counts — no rounding surface.
    "q_ship_priority" -> graft.queries.ShipPriority.sql("lineitem", "orders"),
    // Q9 class: five-table profit chain, exact integer profit units.
    "q_profit_measure" -> graft.queries.ProfitMeasure.sql(
      "lineitem", "orders", "part", "supplier", "nation"),
    // Q10 class: top-20 by exact-integer-derived revenue, total-order
    // tiebreak under the LIMIT.
    "q_returned_item" -> graft.queries.ReturnedItem.sql(
      "lineitem", "orders", "customer", "nation"),
    // Q14 class: one scan, two conditional BIGINT sums, one division.
    "q_promo_effect" -> graft.queries.PromoEffect.sql("lineitem", "part"),
    // Q16 class: NOT IN exclusion + distinct supplier count.
    "q_parts_supplier" -> graft.queries.PartsSupplier.sql(
      "lineitem", "part", "supplier"),
    // Q21 class: DuckDB decorrelates the double EXISTS/NOT EXISTS
    // itself — agreement pins the semi/anti rewrite cross-engine.
    "q_multi_exists" -> graft.queries.MultiExists.oracleSql,
    // Window spelling in DuckDB — mechanisms differ BY DESIGN; the
    // snapshot rows are the contract.
    "q_latest_by_key" -> graft.queries.LatestByKey.oracleSql,
    // IDENTICAL text: two ANSI engines must agree that one NULL in
    // the list empties NOT IN while NOT EXISTS is unaffected.
    "q_not_in_null" -> graft.queries.NotInNull.sql("customer", "orders"),
    "q_group_having_in" ->
      graft.queries.GroupHavingIn.sql("customer", "orders", "lineitem"),
    "q_custdist" -> graft.queries.CustDist.oracleSql,
    "q_or_pushdown" -> graft.queries.OrPushdown.oracleSql,
    "q_except_all" -> graft.queries.BagSetOps.oracleSql,
    "q_interval_merge" -> graft.queries.IntervalMerge.oracleSql,
    "q_first_last" -> graft.queries.FirstLast.oracleSql,
    "q_grouping_id" -> graft.queries.GroupingId.oracleSql,
    "q_calendar" -> graft.queries.Calendar.oracleSql,
    "q_null_safe_join" -> graft.queries.NullSafeJoin.oracleSql,
    "q_explode_outer" -> graft.queries.ExplodeOuter.oracleSql,
    "q_sequence_match" -> graft.queries.SequenceMatch.oracleSql,
    // The oracle computes the identical token stream with DuckDB's
    // naive single global window cumsum — different plan (the engine
    // runs the two-level distributed prefix sum), same offsets.
    // `p` MUST be cast to BIGINT: DuckDB widens window sum(BIGINT) to
    // HUGEINT, which propagates through the `//` span arithmetic and
    // reaches pandas as float64 — "1.0" vs Spark's "1" fails any
    // stringifying hash while passing a numeric compare (the exact
    // r7 driver-gate flake; the manifest oracle below always cast).
    "corpus_seqpack" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CAST(length(regexp_extract_all(text, '[A-Za-z]+')) + length(regexp_extract_all(text, '[0-9]+')) + length(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS nt
        |  FROM documents),
        |pre AS (
        |  SELECT doc_id, nt,
        |    CAST(coalesce(sum(nt) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS p
        |  FROM toks WHERE nt > 0)
        |SELECT ((p + nt - 1) // 64) - (p // 64) + 1 AS n_spans,
        |  count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
        |FROM pre GROUP BY 1 ORDER BY 1""".stripMargin,
    // The manifest oracle explodes each doc's span range from the same
    // naive global-window offsets.
    "corpus_seqpack_manifest" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CAST(length(regexp_extract_all(text, '[A-Za-z]+')) + length(regexp_extract_all(text, '[0-9]+')) + length(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS nt
        |  FROM documents),
        |pre AS (
        |  SELECT doc_id, nt,
        |    CAST(coalesce(sum(nt) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS p
        |  FROM toks WHERE nt > 0),
        |m AS (
        |  SELECT doc_id, nt, p,
        |    unnest(generate_series(p // 64, (p + nt - 1) // 64)) AS seq_id
        |  FROM pre)
        |SELECT doc_id, seq_id,
        |  greatest(seq_id * 64 - p, 0) AS off_in_doc,
        |  least((seq_id + 1) * 64, p + nt) - greatest(seq_id * 64, p) AS span_len
        |FROM m ORDER BY doc_id, seq_id""".stripMargin,
    // Cents move as exact integers: floor(v·100 + ½) both sides, the
    // linear split is `cents div n` + remainder to the earliest touch
    // (rk_old = 1) — allocations sum to the purchase by construction.
    "q_attribution" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t, value FROM events),
        |touches AS (SELECT user_id, event_type AS channel, t AS tt, event_id AS touch_id
        |            FROM ev WHERE event_type IN ('view', 'click')),
        |purchases AS (SELECT user_id, t AS tp, event_id AS purchase_id,
        |                CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |              FROM ev WHERE event_type = 'purchase'),
        |pairs AS (SELECT p.purchase_id, p.cents, tch.channel, tch.tt, tch.touch_id
        |          FROM purchases p JOIN touches tch USING (user_id)
        |          WHERE tch.tt <= p.tp AND p.tp - tch.tt <= 604800000000),
        |c AS (SELECT *, count(*) OVER (PARTITION BY purchase_id) AS n,
        |        row_number() OVER (PARTITION BY purchase_id ORDER BY tt DESC, touch_id DESC) AS rk_new,
        |        row_number() OVER (PARTITION BY purchase_id ORDER BY tt ASC, touch_id ASC) AS rk_old
        |      FROM pairs)
        |SELECT channel,
        |  count(DISTINCT purchase_id) AS n_purchases_touched,
        |  count(*) AS n_touches,
        |  CAST(sum(CASE WHEN rk_new = 1 THEN cents ELSE 0 END) AS BIGINT) AS last_touch_cents,
        |  CAST(sum(cents // n + CASE WHEN rk_old = 1 THEN cents % n ELSE 0 END) AS BIGINT) AS linear_cents
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // Same trigram lags, same deterministic (ts, event_id) order, same
    // (count desc, path asc) cut.
    "q_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
        |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS p1,
        |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS p2
        |  FROM events
        |)
        |SELECT p1, p2, event_type AS p3, count(*) AS n
        |FROM e WHERE p1 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, p1, p2, p3 LIMIT 15""".stripMargin,
    // The sketch's 5%-accuracy boolean is the pinned contract; the
    // oracle computes only the exact count (HLL internals are
    // engine-specific by nature).
    "q_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact, TRUE AS approx_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // The GK sketch's in-band boolean is the pinned contract; the
    // oracle computes only the exact percentile (sketch internals are
    // engine-specific by nature).
    "q_approx_percentile" ->
      """SELECT floor(quantile_cont(l_extendedprice, 0.5) * 100 + 0.5) / 100 AS exact_p50,
        |  TRUE AS approx_ok
        |FROM lineitem""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n, count(k) AS n_parsed,
        |  floor(avg(k) * 100 + 0.5) / 100 AS avg_k, min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Chained step windows (t2 from t1, t3 from t2) — the oracle
    // rebuilds the chain with three dependent CTEs. The streaming
    // state machine must converge to the same chain, so it shares
    // the oracle verbatim.
    "q_funnel" -> FunnelOracle,
    "q_window_funnel" -> graft.queries.WindowFunnel.oracleSql,
    "stream_funnel" -> FunnelOracle,
    // The MG sketch must be invisible: the oracle is the full
    // GROUP BY ... HAVING the sketch path avoids shuffling.
    "q_heavy_hitters" ->
      """SELECT hk, count(*) AS cnt
        |FROM (SELECT CAST(length(bin((event_id % 65536) + 1)) AS BIGINT) AS hk FROM events)
        |GROUP BY 1 HAVING count(*) * 8 > (SELECT count(*) FROM events)
        |ORDER BY 1""".stripMargin,
    // Exact HUGEINT sufficient stats; only sqrt/divide in doubles
    // (correctly-rounded IEEE ops over bit-identical operands).
    "q_corr" -> graft.queries.Corr.oracleSql,
    // Independent capped WITH RECURSIVE fixpoint over the same grid.
    "q_shortest_path" -> graft.queries.ShortestPath.oracleSql,
    "q_anomaly_mad" -> graft.queries.AnomalyMad.oracleSql,
    // Sample (n-1) forms on both engines; per-column rounding sized
    // so merge-order float noise cannot flip a digit.
    "q_stats_moments" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(stddev_samp(l_extendedprice), 2) AS sd_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ntile" ->
      """SELECT quartile, count(*) AS n_orders, sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) / 100.0 AS total,
        |  round(avg(o_totalprice), 4) AS avg_price
        |FROM (
        |  SELECT o_totalprice, CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
        |  FROM orders
        |) t GROUP BY 1 ORDER BY 1""".stripMargin,
    // The bloom pre-filter must be invisible: the oracle is the PLAIN
    // join against the filtered dim.
    "q_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |  ((sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) + 50) // 100) / 100.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Mixed-type columns normalized to exact BIGINTs (cents / ascii /
    // epoch-µs); planted nulls replanted identically.
    "q_profile" -> graft.queries.Profile.oracleSql,
    "q_hhi" -> graft.queries.Hhi.oracleSql,
    "q_chisq" -> graft.queries.ChiSq.oracleSql,
    // Violations are PLANTED (id-derived corrupt twins/dups, replanted
    // identically in SQL) so every check has a known nonzero count.
    "q_integrity" ->
      """WITH p_orders AS (
        |  SELECT * FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 800000000 AS o_orderkey, o_custkey + 900000000 AS o_custkey,
        |    o_orderstatus, -o_totalprice AS o_totalprice, CAST(NULL AS TIMESTAMP) AS o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 1000 = 0
        |  UNION ALL
        |  SELECT * FROM orders WHERE o_orderkey % 1000 = 1
        |), p_lineitem AS (
        |  SELECT * FROM lineitem
        |  UNION ALL
        |  SELECT * REPLACE (l_orderkey + 700000000 AS l_orderkey, -l_quantity AS l_quantity, l_discount + 2 AS l_discount)
        |  FROM lineitem WHERE l_orderkey % 1000 = 2
        |)
        |SELECT check_name, n FROM (
        |  SELECT 'orphan_lineitems' AS check_name, count(*) AS n FROM p_lineitem l WHERE NOT EXISTS (SELECT 1 FROM p_orders o WHERE o.o_orderkey = l.l_orderkey)
        |  UNION ALL
        |  SELECT 'orphan_orders', count(*) FROM p_orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |  UNION ALL
        |  SELECT 'duplicate_orderkeys', count(*) FROM (SELECT o_orderkey FROM p_orders GROUP BY 1 HAVING count(*) > 1) d
        |  UNION ALL
        |  SELECT 'bad_order_price', count(*) FILTER (o_totalprice IS NULL OR o_totalprice <= 0) FROM p_orders
        |  UNION ALL
        |  SELECT 'null_order_date', count(*) FILTER (o_orderdate IS NULL) FROM p_orders
        |  UNION ALL
        |  SELECT 'bad_lineitem_qty', count(*) FILTER (l_quantity <= 0) FROM p_lineitem
        |  UNION ALL
        |  SELECT 'bad_lineitem_discount', count(*) FILTER (l_discount < 0 OR l_discount > 1) FROM p_lineitem
        |) t ORDER BY check_name""".stripMargin,
    // SCD2 run compression: lag-boundary + running version sum +
    // run collapse + lead chaining, all in exact integer µs.
    "q_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type AS state, epoch_us(ts) AS te FROM events
        |), marked AS (
        |  SELECT *, CASE WHEN lag(state) OVER w IS NULL OR lag(state) OVER w <> state
        |    THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY te, event_id)
        |), versioned AS (
        |  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY te, event_id) AS BIGINT) AS version
        |  FROM marked
        |), runs AS (
        |  SELECT user_id, version, min(state) AS state, min(te) AS valid_from_us,
        |    count(*) AS n_events
        |  FROM versioned GROUP BY 1, 2
        |)
        |SELECT user_id, version, state, valid_from_us,
        |  lead(valid_from_us) OVER w2 AS valid_to_us,
        |  lead(valid_from_us) OVER w2 IS NULL AS is_current,
        |  n_events
        |FROM runs WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
        |ORDER BY user_id, version""".stripMargin,
    // Latest-event-before-t ranked formulation: two independent
    // definitions of "state at t" must agree.
    "q_time_travel" -> graft.queries.TimeTravel.oracleSql,
    // Deterministic mode: ties to the smaller value in both engines.
    "q_mode" ->
      """SELECT l_returnflag, mode_qty, cnt FROM (
        |  SELECT l_returnflag, l_quantity AS mode_qty, count(*) AS cnt,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY count(*) DESC, l_quantity) AS rk
        |  FROM lineitem GROUP BY l_returnflag, l_quantity
        |) t WHERE rk = 1 ORDER BY l_returnflag""".stripMargin,
    // Numeric sort before stringify on both sides.
    "q_listagg" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // Spike flag = integer cross-multiplication (no stddev, no
    // division); planted ×10 bursts replanted identically.
    "q_rate_spike" ->
      """WITH e AS (
        |  SELECT (epoch_us(ts) - 1704067200000000) // 3600000000 AS h FROM events
        |), planted AS (
        |  SELECT h FROM e
        |  UNION ALL
        |  SELECT h FROM e, generate_series(1, 9) WHERE h % 97 = 13
        |), hourly AS (SELECT h, count(*) AS n FROM planted GROUP BY 1
        |), t AS (
        |  SELECT h, n,
        |    sum(n) OVER (ORDER BY h RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail
        |  FROM hourly
        |)
        |SELECT h, n, CAST(trail AS BIGINT) AS trail, (n * 24 > trail * 3) AS is_spike
        |FROM t WHERE h >= (SELECT min(h) + 24 FROM hourly)
        |ORDER BY h""".stripMargin,
    // The oracle overlaps with a native inequality join — a different
    // algorithm than the engine's grid bucketing, same answer.
    "q_interval_overlap" ->
      """WITH a AS (
        |  SELECT event_id, epoch_us(ts) AS s, epoch_us(ts) + 1200000000 AS e FROM events
        |), b AS (
        |  SELECT k, 1704067200000000 + k * 1800000000 AS ws,
        |    1704067200000000 + k * 1800000000 + 2700000000 AS we
        |  FROM (SELECT unnest(generate_series(0, kmax)) AS k
        |        FROM (SELECT (max(e) - 1704067200000000) // 1800000000 AS kmax FROM a))
        |)
        |SELECT k, count(*) AS n_events
        |FROM a JOIN b ON a.s < b.we AND b.ws < a.e
        |GROUP BY k ORDER BY k""".stripMargin,
    // Transition counts are exact; the row-normalized probability is
    // one IEEE division, bit-identical cross-engine.
    "q_transition" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type AS to_type, epoch_us(ts) AS te FROM events
        |), lagged AS (
        |  SELECT lag(to_type) OVER (PARTITION BY user_id ORDER BY te, event_id) AS from_type,
        |    to_type
        |  FROM e
        |), m AS (
        |  SELECT from_type, to_type, count(*) AS n FROM lagged
        |  WHERE from_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n,
        |  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type) AS p
        |FROM m ORDER BY from_type, to_type""".stripMargin,
    // Gap rows are generated FROM the observations (sequence to the
    // next observed bucket), so LOCF needs no spine join; the filled
    // value is a bare max of observed doubles — no arithmetic.
    "q_islands" -> graft.queries.Islands.oracleSql,
    "q_percent_rank_cume" -> graft.queries.RankFamily.oracleSql,
    "q_gapfill" ->
      """WITH e AS (
        |  SELECT user_id, (epoch_us(ts) - 1704067200000000) // 3600000000 AS h, value FROM events
        |), obs AS (
        |  SELECT user_id, h, max(value) AS v, count(*) AS n_obs FROM e GROUP BY 1, 2
        |), nxt AS (
        |  SELECT *, lead(h) OVER (PARTITION BY user_id ORDER BY h) AS next_h FROM obs
        |)
        |SELECT user_id, hour_idx,
        |  CASE WHEN hour_idx = h THEN n_obs ELSE 0 END AS n_obs,
        |  v AS value_filled,
        |  (hour_idx = h) AS is_observed
        |FROM (
        |  SELECT user_id, h, n_obs, v,
        |    unnest(generate_series(h, coalesce(next_h - 1, h))) AS hour_idx
        |  FROM nxt
        |) t ORDER BY user_id, hour_idx""".stripMargin,
    // Midranks are tie-group invariants (.0/.5 exact); the formula is
    // integer-exact until one final division.
    "svm_feature_auc" ->
      """WITH x AS (
        |  SELECT e.vec_id, (e.label = 0) AS pos, t.i - 1 AS i,
        |    CAST(e.embedding[t.i] AS DOUBLE) AS v
        |  FROM embeddings e, generate_series(1, 8) t(i)
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY i ORDER BY v, vec_id) AS rn FROM x
        |), m AS (
        |  SELECT *, avg(rn) OVER (PARTITION BY i, v) AS midrank FROM r
        |), a AS (
        |  SELECT i, sum(CASE WHEN pos THEN midrank END) AS rpos,
        |    count(CASE WHEN pos THEN 1 END) AS n_pos,
        |    count(CASE WHEN NOT pos THEN 1 END) AS n_neg
        |  FROM m GROUP BY 1
        |)
        |SELECT CAST(i AS BIGINT) AS i,
        |  (rpos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg) AS auc,
        |  n_pos, n_neg
        |FROM a ORDER BY i""".stripMargin,
    // tf·N and df are exact integers; the single IEEE division is
    // K unrolled BPE merge rounds over the identical word encoding —
    // exact integer pair counts, total (n DESC, lhs, rhs) tie order,
    // and `replace`'s left-to-right non-overlapping scan give one
    // deterministic merge sequence in both engines.
    "text_bpe_train" -> graft.text.BpeTrain.oracleSql(),
    // Same chain, final vocabulary re-joined to (doc, word) counts.
    "text_bpe_encode" -> graft.text.BpeTrain.oracleSqlEncode(),
    // The identical hard-EM alternation unrolled: seed substring
    // explode, M-position DP chain, backtrack fold, prune/floor/
    // re-score — K rounds deep, exact integers end to end.
    "text_unigram_train" -> graft.text.UnigramLm.oracleSql(),
    // One more Viterbi pass under vocab_K, re-joined to (doc, word).
    "text_unigram_encode" -> graft.text.UnigramLm.oracleSqlEncode(),
    // Exact-integer bigram surprise: bitlen((c_a+V) div (c_ab+1))−1
    // via printf('%b') — no floating log anywhere.
    "text_lm_surprise" -> graft.text.LmSurprise.oracleSql(),
    // Same anchored lookahead-free regexes + list ops in DuckDB.
    "text_url_normalize" -> graft.text.UrlNormalize.oracleSql,
    // Same plant + normalization + min-doc keeper, host rollup.
    "dedup_url" -> graft.text.UrlNormalize.dedupOracleSql,
    // Same bitlen integer identity via printf('%b').
    "text_entropy" -> graft.text.Entropy.oracleSql(),
    // Identical md5 permutation — the manifest pins the permutation
    // itself (first/last key AND doc per shard), not just statistics.
    "corpus_shuffle" -> graft.text.CorpusShuffle.oracleSql(),
    // Manifest + in_order pinned TRUE — earned from the physical files.
    "corpus_shuffle_write" -> graft.text.CorpusShuffle.writeOracleSql(),
    // Naive single-global-window pack over the identical md5-permuted
    // stream — different plan (two-level prefix sum), same spans.
    "corpus_shuffle_pack" -> graft.text.CorpusShuffle.packOracleSql(),
    // Census of the ORIGINAL lineitem — the engine's census comes from
    // the Avro read-back, so a match proves content preservation.
    "src_avro_roundtrip" -> graft.sources.AvroQueries.oracleSql,
    // Census of the ORIGINAL lineitem vs the TFRecord read-back census.
    "src_tfrecord_roundtrip" -> graft.sources.TfRecordQueries.oracleSql,
    "src_webdataset_roundtrip" -> graft.sources.WdsQueries.oracleSql,
    // Census of the ORIGINAL documents vs the exported-shard read-back.
    "corpus_export_tfrecord" -> graft.text.Export.tfRecordOracleSql,
    // Every sub-formula copied verbatim from the oracle row that
    // already pins it (langid scores, token counts, punct class,
    // dedup_exact hash key) — composition, not new semantics.
    "corpus_datacard" -> graft.text.Datacard.oracleSql,
    "corpus_datacard_neardup" -> graft.text.Datacard.oracleSqlNearDup,
    // bit-identical in both engines, so score hashes match exactly.
    "text_tfidf" ->
      """WITH d AS (SELECT doc_id, lower(text) AS text FROM documents),
        |tk AS (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok FROM d),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
        |dfv AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT doc_id, rk, tok, score FROM (
        |  SELECT tf.doc_id, tf.tok,
        |    CAST(tf.tf * n.n AS DOUBLE) / dfv.df AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf * n.n AS DOUBLE) / dfv.df DESC, tf.tok) AS rk
        |  FROM tf JOIN dfv USING (tok), n
        |) t WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    // The LCG rank key is exact integer arithmetic in both engines,
    // so the SELECTION (not just the count) is reproduced.
    "q_sample_stratified" ->
      """SELECT lang, doc_id, rk FROM (
        |  SELECT lang, doc_id, row_number() OVER (
        |    PARTITION BY lang
        |    ORDER BY (doc_id * 1103515245 + 12345) % 2147483648, doc_id) AS rk
        |  FROM documents
        |) t WHERE rk <= 50 ORDER BY lang, rk""".stripMargin,
    // The oracle is a REAL recursive CTE over the same id-derived
    // edge relation — fixpoint semantics vs an actual WITH RECURSIVE.
    "q_hierarchy" ->
      """WITH RECURSIVE r AS (
        |  SELECT o_orderkey AS node, o_orderkey AS root, 0 AS depth
        |  FROM orders WHERE o_orderkey < 10
        |  UNION ALL
        |  SELECT o.o_orderkey, r.root, r.depth + 1
        |  FROM orders o JOIN r ON o.o_orderkey // 10 = r.node
        |  WHERE o.o_orderkey >= 10
        |)
        |SELECT node, root, CAST(depth AS BIGINT) AS depth
        |FROM r ORDER BY node""".stripMargin,
    // SAME text both engines (q_exists_subquery discipline): two
    // independent WITH RECURSIVE implementations must agree on the
    // fixpoint. Spark runs it via spark.sql over temp views.
    "q_recursive_cte" -> graft.queries.RecursiveCte.sql("orders"),
    // Distinct (order, brand) first, canonical b1 < b2 pairs, integer
    // support + per-brand reach; top-20 under a total order.
    "q_market_basket" ->
      """WITH ob AS (
        |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |reach AS (SELECT brand, CAST(count(*) AS BIGINT) AS n_orders FROM ob GROUP BY 1),
        |pairs AS (
        |  SELECT a.brand AS b1, b.brand AS b2, CAST(count(*) AS BIGINT) AS n_both
        |  FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand
        |  GROUP BY 1, 2)
        |SELECT b1, b2, n_both, r1.n_orders AS n_b1, r2.n_orders AS n_b2
        |FROM pairs JOIN reach r1 ON b1 = r1.brand JOIN reach r2 ON b2 = r2.brand
        |ORDER BY n_both DESC, b1, b2 LIMIT 20""".stripMargin,
    // Month arithmetic as exact year*12+month integers; revenue in
    // BIGINT cents — the cohort matrix hashes exactly.
    "q_cohort" ->
      """WITH f AS (SELECT o_custkey, min(o_orderdate) AS fd FROM orders GROUP BY 1)
        |SELECT CAST(year(fd)*12 + month(fd) AS INTEGER) AS cohort_m,
        |  CAST((year(o_orderdate)*12 + month(o_orderdate)) - (year(fd)*12 + month(fd)) AS INTEGER) AS months_since,
        |  CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
        |  sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) / 100.0 AS revenue
        |FROM orders o JOIN f ON o.o_custkey = f.o_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // ntile over TOTAL orders (custkey tiebreaker) is a pure function
    // of the data — quartile boundaries land identically cross-engine.
    "q_rfm" ->
      """WITH pc AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_order,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1)
        |SELECT r_bucket, f_bucket, m_bucket, CAST(count(*) AS BIGINT) AS n_customers
        |FROM (
        |  SELECT CAST(ntile(4) OVER (ORDER BY last_order, o_custkey) AS INTEGER) AS r_bucket,
        |         CAST(ntile(4) OVER (ORDER BY n_orders, o_custkey) AS INTEGER) AS f_bucket,
        |         CAST(ntile(4) OVER (ORDER BY cents, o_custkey) AS INTEGER) AS m_bucket
        |  FROM pc)
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // The oracle is the EXACT Levenshtein join over the same planted
    // keys — the engine's prefix-filtered pipeline must be both
    // complete and FP-free to hash-match it. Candidate generation uses
    // the textbook pigeonhole for distance <= 1 (a single edit cannot
    // touch both the first 12 and the last 12 characters, so one of
    // the two must match EXACTLY) as two hash equi-joins instead of the
    // former all-pairs inequality join, whose ~keys² levenshtein calls
    // wedged DuckDB at sf1; the final levenshtein <= 1 predicate is
    // unchanged and exact, so the result set is identical.
    "dedup_editdist" ->
      """WITH k AS (
        |  SELECT doc_id, lower(substring(regexp_replace(text, '\s+', ' ', 'g'), 1, 24)) AS key
        |  FROM documents
        |), twins AS (
        |  SELECT doc_id + 4000000 AS doc_id,
        |    substring(key, 1, CAST(doc_id % 20 AS INT)) || 'q' ||
        |      substring(key, CAST(doc_id % 20 AS INT) + 2, 24) AS key
        |  FROM k WHERE doc_id % 10 = 7
        |), allk AS (SELECT * FROM k UNION ALL SELECT * FROM twins),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.key AS ka, b.key AS kb
        |  FROM allk a JOIN allk b
        |    ON substring(a.key, 1, 12) = substring(b.key, 1, 12)
        |    AND a.doc_id < b.doc_id
        |  UNION
        |  SELECT a.doc_id, b.doc_id, a.key, b.key
        |  FROM allk a JOIN allk b
        |    ON substring(a.key, length(a.key) - 11, 12) = substring(b.key, length(b.key) - 11, 12)
        |    AND a.doc_id < b.doc_id
        |)
        |SELECT id_a, id_b, CAST(levenshtein(ka, kb) AS INT) AS dist
        |FROM cand
        |WHERE levenshtein(ka, kb) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    // v2 replanted identically; per-class census + key-sum + exact
    // cents-delta certificates from one full outer join.
    "q_snapshot_diff" -> graft.queries.SnapshotDiff.oracleSql,
    // Full recompute from raw events — the refresh must equal it.
    "q_incremental_agg" -> graft.queries.IncrementalAgg.oracleSql,
    // The change batch is replanted identically; latest version wins,
    // tombstones drop the key.
    "q_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice, 0 AS version, false AS is_delete FROM orders
        |), changes AS (
        |  SELECT o_orderkey, o_totalprice + 1000 AS o_totalprice, 1 AS version, false AS is_delete
        |  FROM orders WHERE o_orderkey % 1000 = 3
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, 1, true FROM orders WHERE o_orderkey % 1000 = 4
        |  UNION ALL
        |  SELECT o_orderkey + 600000000, o_totalprice, 1, false FROM orders WHERE o_orderkey % 1000 = 5
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM changes)
        |)
        |SELECT o_orderkey, o_totalprice, CAST(version AS BIGINT) AS version
        |FROM ranked WHERE rn = 1 AND NOT is_delete
        |ORDER BY o_orderkey""".stripMargin,
    // The batch q_topk_per_group oracle verbatim: mergeable per-group
    // top-k state folded across micro-batches must converge to the
    // all-at-once leaderboard.
    "stream_topk" ->
      """SELECT p_brand, p_partkey, rk FROM (
        |  SELECT p_brand, p_partkey, CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rk FROM part
        |) t WHERE rk <= 3 ORDER BY p_brand, rk, p_partkey""".stripMargin,
    // The batch q_rate_spike oracle verbatim: chunked additive hourly
    // counting must converge to the all-at-once hourly series.
    "stream_rate_spike" ->
      """WITH e AS (
        |  SELECT (epoch_us(ts) - 1704067200000000) // 3600000000 AS h FROM events
        |), planted AS (
        |  SELECT h FROM e
        |  UNION ALL
        |  SELECT h FROM e, generate_series(1, 9) WHERE h % 97 = 13
        |), hourly AS (SELECT h, count(*) AS n FROM planted GROUP BY 1
        |), t AS (
        |  SELECT h, n,
        |    sum(n) OVER (ORDER BY h RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail
        |  FROM hourly
        |)
        |SELECT h, n, CAST(trail AS BIGINT) AS trail, (n * 24 > trail * 3) AS is_spike
        |FROM t WHERE h >= (SELECT min(h) + 24 FROM hourly)
        |ORDER BY h""".stripMargin,
    // Same shape as q_merge_upsert's oracle plus the stream's
    // version-2 re-update wave — chunked apply must equal
    // all-changes-at-once.
    "stream_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice, 0 AS version, false AS is_delete FROM orders
        |), changes AS (
        |  SELECT o_orderkey, o_totalprice + 1000 AS o_totalprice, 1 AS version, false AS is_delete
        |  FROM orders WHERE o_orderkey % 1000 = 3
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, 1, true FROM orders WHERE o_orderkey % 1000 = 4
        |  UNION ALL
        |  SELECT o_orderkey + 600000000, o_totalprice, 1, false FROM orders WHERE o_orderkey % 1000 = 5
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice + 2000, 2, false FROM orders WHERE o_orderkey % 1000 = 3
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM changes)
        |)
        |SELECT o_orderkey, o_totalprice, CAST(version AS BIGINT) AS version
        |FROM ranked WHERE rn = 1 AND NOT is_delete
        |ORDER BY o_orderkey""".stripMargin,
    // Z-clustering is semantically invisible: the oracle is the same
    // box aggregate on the unclustered table, bounds recomputed with
    // the same exact integer divisions.
    "q_zorder" ->
      """WITH b AS (
        |  SELECT max(l_suppkey) // 4 AS slo, max(l_suppkey) // 2 AS shi,
        |    max(l_partkey) // 4 AS plo, max(l_partkey) // 2 AS phi
        |  FROM lineitem
        |)
        |SELECT count(*) AS n_items,
        |  ((sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) + 50) // 100) / 100.0 AS revenue
        |FROM lineitem, b
        |WHERE l_suppkey > slo AND l_suppkey <= shi
        |  AND l_partkey > plo AND l_partkey <= phi""".stripMargin,
    // Compaction is semantically invisible: the oracle computes the
    // census from the base table; the physical certificates
    // (fewer-files, per-file cap) are deterministic-by-construction
    // booleans the hash must reproduce.
    "q_compact" ->
      """SELECT o_orderstatus, count(*) AS n_rows,
        |  sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) / 100.0 AS total,
        |  true AS compact_ok, true AS cap_ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // The struct-array packing must be lossless: the oracle is the
    // plain two-level aggregate that never builds the array.
    "q_nested" ->
      """SELECT n_items, count(*) AS n_orders, CAST(sum(qty_sum) AS BIGINT) AS total_qty
        |FROM (SELECT l_orderkey, count(*) AS n_items, sum(l_quantity) AS qty_sum
        |      FROM lineitem GROUP BY 1) o
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Partition pruning must be invisible: the oracle is the plain
    // 4-table star join.
    "q_dpp" ->
      """SELECT s_nationkey AS n, count(*) AS n_items,
        |  ((sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) + 50) // 100) / 100.0 AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_range_frame" ->
      """SELECT user_id, event_id, n_win, sum_win FROM (
        |  SELECT user_id, event_id,
        |    count(*) OVER w AS n_win,
        |    floor(sum(value) OVER w * 100 + 0.5) / 100 AS sum_win
        |  FROM (SELECT user_id, event_id, epoch_us(ts) AS te, value FROM events)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY te RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |) t ORDER BY 1, 2""".stripMargin,
    // Arithmetic week indices from the corpus epoch (integer-exact);
    // `//` here = Spark's `div` on non-negative operands.
    "q_retention" ->
      """WITH e AS (SELECT user_id, (epoch_us(ts) - 1704067200000000) // 604800000000 AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY 1)
        |SELECT c.cohort_week, e.wk - c.cohort_week AS week_offset, count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN c USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Bucketization must be invisible: the oracle is the PLAIN
    // inequality join.
    "q_range_join" ->
      """WITH w AS (
        |  SELECT event_id AS window_id, epoch_us(ts) - 600000000 AS ws, epoch_us(ts) + 600000000 AS we
        |  FROM events ORDER BY value DESC, event_id LIMIT 20
        |)
        |SELECT w.window_id, count(*) AS n_events, floor(sum(e.value) * 100 + 0.5) / 100 AS total_value
        |FROM w JOIN (SELECT epoch_us(ts) AS t, value FROM events) e
        |  ON e.t >= w.ws AND e.t < w.we
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // The runtime skew split must be invisible: plain remapped join.
    "q_skew_aqe" -> graft.queries.SkewAqe.oracleSql,
    // Salting must be invisible: the oracle is the PLAIN join.
    "q_salted_join" ->
      """SELECT s_nationkey, count(*) AS n_items,
        |  ((sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) + 50) // 100) / 100.0 AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_setops" ->
      """WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        |tagged AS (
        |  SELECT 'both_f_and_o' AS kind, o_custkey FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM o) t1
        |  UNION ALL
        |  SELECT 'f_only' AS kind, o_custkey FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM o) t2
        |  UNION ALL
        |  SELECT 'o_only' AS kind, o_custkey FROM (SELECT o_custkey FROM o EXCEPT SELECT o_custkey FROM f) t3
        |)
        |SELECT kind, count(*) AS n FROM tagged GROUP BY kind ORDER BY kind""".stripMargin,
    "dedup_exact" ->
      """WITH g AS (SELECT md5(lower(text)) AS h, count(*) AS n_copies FROM documents GROUP BY 1)
        |SELECT count(*) AS n_unique,
        |  CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
        |  CAST(sum(n_copies - 1) AS BIGINT) AS n_removed FROM g""".stripMargin,
    // Exact-substring dedup: distinct 12-token windows per doc, shared
    // = present in >= 2 docs; per-doc audit of total window positions,
    // shared-window count, and the flag.
    "dedup_substring" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), w AS (
        |  SELECT doc_id, unnest([array_to_string(t[i:i+11], ' ') FOR i IN generate_series(1, length(t) - 11)]) AS win
        |  FROM tk
        |), dw AS (SELECT DISTINCT doc_id, win FROM w),
        |sh AS (SELECT win FROM dw GROUP BY win HAVING count(*) >= 2),
        |per AS (SELECT d.doc_id, count(*) AS n_dup FROM dw d JOIN sh USING (win) GROUP BY 1)
        |SELECT tk.doc_id, CAST(greatest(length(tk.t) - 11, 0) AS BIGINT) AS n_windows,
        |  CAST(coalesce(per.n_dup, 0) AS BIGINT) AS n_dup_windows,
        |  coalesce(per.n_dup, 0) > 0 AS flagged
        |FROM tk LEFT JOIN per USING (doc_id) ORDER BY tk.doc_id""".stripMargin,
    // Maximal consecutive-shared-window runs per doc: positions whose
    // window is shared collapse via the pos - row_number() identity.
    "dedup_substring_spans" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        |  FROM documents
        |), w AS (
        |  SELECT doc_id, unnest([{'pos': i, 'win': array_to_string(t[i:i+11], ' ')} FOR i IN generate_series(1, length(t) - 11)], recursive := true)
        |  FROM tk
        |), sh AS (
        |  SELECT win FROM (SELECT DISTINCT doc_id, win FROM w) GROUP BY win HAVING count(*) >= 2
        |), r AS (
        |  SELECT w.doc_id, w.pos, w.pos - row_number() OVER (PARTITION BY w.doc_id ORDER BY w.pos) AS grp
        |  FROM w JOIN sh USING (win)
        |), runs AS (
        |  SELECT doc_id, grp, count(*) AS run_len FROM r GROUP BY 1, 2
        |)
        |SELECT doc_id, count(*) AS n_spans, CAST(max(run_len) + 11 AS BIGINT) AS max_span_tokens
        |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin,
    // The dedup OUTPUT itself (deterministic keeper = min doc_id).
    "dedup_survivors" ->
      """WITH k AS (SELECT md5(lower(text)) AS h, min(doc_id) AS doc_id FROM documents GROUP BY 1)
        |SELECT d.doc_id, d.lang, d.source, d.n_chars
        |FROM documents d JOIN k ON d.doc_id = k.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // Planted-recall contract: rebuild the planted corpus (same column
    // arithmetic as Dedup.plantedDocs), recompute the exact word-3-gram
    // Jaccard of every planted pair independently, and require the
    // engine's LSH pipeline to have recovered exactly the pairs >= 0.8.
    "dedup_minhash" ->
      """WITH planted AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' graftplantmark' FROM documents
        |  WHERE doc_id % 20 = 0 AND n_chars >= 200
        |), tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t FROM planted
        |), g AS (
        |  SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, length(t) - 2)]) AS sh FROM tk
        |), j AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(CAST(length(list_intersect(a.sh, b.sh)) AS DOUBLE) / length(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
        |  FROM g a JOIN g b ON b.doc_id = a.doc_id + 1000000
        |)
        |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.8 ORDER BY id_a""".stripMargin,
    // Full recall on planted near-identical pairs is the contract: the
    // oracle is the planting rule itself (id arithmetic), so one missed
    // band collision or hamming > 8 is a hash mismatch.
    "dedup_simhash" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b FROM documents
        |WHERE doc_id % 20 = 0 AND n_chars >= 200 ORDER BY 1""".stripMargin,
    // Planted exact-duplicate vectors: identical vectors share every LSH
    // bucket, so each planted pair MUST be recovered at cosine 1.0.
    "dedup_embedding" ->
      """SELECT vec_id AS id_a, vec_id + 1000000 AS id_b, CAST(1.0 AS DOUBLE) AS cosine
        |FROM embeddings WHERE vec_id % 25 = 0 ORDER BY 1""".stripMargin,
    // Graded near-dup tier contracts: the engine computes per-tier
    // realized recall against margins set below the analytic
    // expectation (NearDup.scala documents the derivations and the
    // probe-measured values); the oracle pins the booleans. Deterministic
    // pipelines make these stable per sf; a detuned knob (bands, tables,
    // multiprobe width, signature length) flips a boolean = hash break.
    "dedup_minhash_near" ->
      """SELECT * FROM (VALUES
        |  ('j55', true, true, true),
        |  ('j70', true, true, true),
        |  ('j85', true, true, true)) AS t(tier, planted_ok, recall_ok, jaccard_ok)
        |ORDER BY tier""".stripMargin,
    // Survivor manifest over the planted 2-link chains: the expected
    // transitive closure is pure id arithmetic — every eligible doc a
    // roots cluster {a, a+1M, a+2M}; all other docs are singleton
    // keepers. A one-hop "closure", a cross-chain merge, or a missed
    // LSH edge each produce a different manifest.
    "dedup_near_survivors" ->
      """WITH elig AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id % 2 = 0 AND length(regexp_extract_all(text, '\S+')) >= 60
        |), manifest AS (
        |  SELECT doc_id, doc_id AS cluster_id FROM documents
        |  UNION ALL SELECT doc_id + 1000000, doc_id FROM elig
        |  UNION ALL SELECT doc_id + 2000000, doc_id FROM elig
        |)
        |SELECT doc_id, cluster_id, doc_id = cluster_id AS keep
        |FROM manifest ORDER BY doc_id""".stripMargin,
    // Same manifest arithmetic as dedup_near_survivors, then the split
    // census: multiply-mod + shift-xor finalizer hash in pure BIGINT
    // (bit-identical cross-engine; the nonlinear finalizer matters —
    // a bare multiplier is translation-covariant and the chains sit at
    // constant id offsets), cluster-level assignment vs the doc-level
    // counterfactual straddle count.
    "corpus_split_leakproof" ->
      """WITH elig AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id % 2 = 0 AND length(regexp_extract_all(text, '\S+')) >= 60
        |), manifest AS (
        |  SELECT doc_id, doc_id AS cluster_id FROM documents
        |  UNION ALL SELECT doc_id + 1000000, doc_id FROM elig
        |  UNION ALL SELECT doc_id + 2000000, doc_id FROM elig
        |), h AS (
        |  SELECT doc_id, cluster_id,
        |    (cluster_id * 2654435761) % 4294967296 AS cb1,
        |    (doc_id * 2654435761) % 4294967296 AS db1
        |  FROM manifest
        |), h2 AS (
        |  SELECT doc_id, cluster_id,
        |    (xor(cb1, cb1 // 65536) * 1540483477) % 4294967296 AS cb2,
        |    (xor(db1, db1 // 65536) * 1540483477) % 4294967296 AS db2
        |  FROM h
        |), a AS (
        |  SELECT doc_id, cluster_id,
        |    CASE WHEN xor(cb2, cb2 // 8192) % 10 < 9 THEN 'train' ELSE 'holdout' END AS split,
        |    CASE WHEN xor(db2, db2 // 8192) % 10 < 9 THEN 'train' ELSE 'holdout' END AS doc_split
        |  FROM h2
        |), c AS (
        |  SELECT cluster_id, split, count(*) AS n_docs_c, count(DISTINCT doc_split) AS n_doc_splits
        |  FROM a GROUP BY 1, 2
        |)
        |SELECT split, CAST(sum(n_docs_c) AS BIGINT) AS n_docs, count(*) AS n_clusters,
        |  count(CASE WHEN n_doc_splits > 1 THEN 1 END) AS leak_clusters
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_simhash_near" ->
      """SELECT * FROM (VALUES
        |  ('swap15', true, true),
        |  ('swap30', true, true)) AS t(tier, planted_ok, recall_ok)
        |ORDER BY tier""".stripMargin,
    // The class counts follow from the batch-construction predicates:
    // verbatim copies are exact, 90%-truncations of >= 60-token docs
    // verify at Jaccard ~ 0.90 >= 0.85, reversed+nonce docs match
    // nothing. Precedence exact > near > novel.
    "dedup_incremental" ->
      """SELECT 'exact_dup' AS category, count(*) AS n_docs FROM documents WHERE doc_id % 8 = 0
        |UNION ALL
        |SELECT 'near_dup', count(*) FROM documents
        |WHERE doc_id % 8 = 1 AND length(regexp_extract_all(text, '\S+')) >= 60
        |UNION ALL
        |SELECT 'novel', count(*) FROM documents
        |WHERE doc_id % 8 = 2 AND length(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) >= 3
        |ORDER BY category""".stripMargin,
    // The indexed path must lose nothing vs the self-contained one:
    // identical census, identical oracle.
    "dedup_incremental_indexed" ->
      """SELECT 'exact_dup' AS category, count(*) AS n_docs FROM documents WHERE doc_id % 8 = 0
        |UNION ALL
        |SELECT 'near_dup', count(*) FROM documents
        |WHERE doc_id % 8 = 1 AND length(regexp_extract_all(text, '\S+')) >= 60
        |UNION ALL
        |SELECT 'novel', count(*) FROM documents
        |WHERE doc_id % 8 = 2 AND length(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) >= 3
        |ORDER BY category""".stripMargin,
    "dedup_embedding_near" ->
      """SELECT * FROM (VALUES
        |  ('c95', true, true, true),
        |  ('c97', true, true, true),
        |  ('c99', true, true, true)) AS t(tier, planted_ok, recall_ok, cosine_ok)
        |ORDER BY tier""".stripMargin,
    "dedup_semantic" ->
      """SELECT * FROM (VALUES
        |  ('c95', true, true, true),
        |  ('c97', true, true, true),
        |  ('c99', true, true, true)) AS t(tier, planted_ok, recall_ok, cosine_ok)
        |ORDER BY tier""".stripMargin,
    "corpus_cluster" ->
      """SELECT * FROM (VALUES
        |  ('c99', true, true),
        |  ('exact', true, true),
        |  ('fit', true, true)) AS t(tier, planted_ok, ok)
        |ORDER BY tier""".stripMargin,
    "corpus_quality_svm" ->
      """SELECT 'good' AS quality_class, count(*) AS n_eval, true AS acc_ok
        |FROM documents WHERE doc_id % 2 = 1
        |UNION ALL
        |SELECT 'junk', count(*), true FROM documents
        |WHERE doc_id % 3 = 0 AND doc_id % 2 = 1
        |ORDER BY quality_class""".stripMargin,
    // Planted corpus rebuilt in SQL; total-order ntile; all rates in
    // exact integer basis points.
    "q_decile_lift" -> graft.text.DecileLift.oracleSql(),
    // The approx path must reproduce the EXACT gains table at this SF
    // (rank error < 1/2 by accuracy sizing) — identical oracle.
    "q_decile_lift_approx" -> graft.text.DecileLift.oracleSql(),
    "ann_near_top1" ->
      """SELECT * FROM (VALUES
        |  ('ivf', true),
        |  ('lsh', true)) AS t(method, top1_ok)
        |ORDER BY method""".stripMargin,
    // the filtered top-1 is the PASSING rotated plant at ≥0.90 rate
    // (the ann_near_top1 bar); the exact-dup decoy — unfiltered top-1
    // for EVERY probe (exact pin) — fails the filter.
    "ann_filtered" ->
      """SELECT * FROM (VALUES
        |  ('ivf_filtered', true, true)
        |) AS t(method, filtered_hit_rate_ok, decoy_is_unfiltered_top1)""".stripMargin,
    // the same planted contract on the GRAPH tier: predicate evaluated
    // inside the beam (expand-through, results passing-only) under the
    // IVF-equal eval budget; rate bars on both legs (graph search is
    // approximate in both directions), budget accounting pinned.
    "ann_filtered_hnsw" ->
      """SELECT * FROM (VALUES
        |  ('hnsw_filtered', true, true, true)
        |) AS t(method, filtered_hit_rate_ok, decoy_rate_ok, budget_ok)""".stripMargin,
    "stream_ann" ->
      """SELECT * FROM (VALUES
        |  ('lsh_stream', true, true, true)
        |) AS t(method, planted_ok, chunked_ok, top1_ok)""".stripMargin,
    // Streaming census over the TFRecord feed == batch census of the
    // original documents (bounded-parity oracle).
    "stream_tfrecord" -> graft.streaming.TfRecordStream.oracleSql,
    // the sink row's census carries the curation filter: same pinned
    // tokenizer-equivalence regex census, thresholded.
    "stream_tfrecord_sink" -> graft.streaming.TfRecordSink.oracleSql,
    // the webdataset ingest answers the IDENTICAL census question as
    // stream_tfrecord — same oracle text by design.
    "stream_webdataset" -> graft.streaming.TfRecordStream.oracleSql,
    "ann_recall_atk" ->
      """SELECT * FROM (VALUES
        |  ('ivf', true, true),
        |  ('lsh', true, true)) AS t(method, planted_ok, recall_ok)
        |ORDER BY method""".stripMargin,
    // Graph tier vs IVF at equal candidate budget: both methods must
    // clear recall@10 >= 0.95 on the same probes/corpus/ground truth,
    // and the graph's measured per-probe evals respect the IVF-equal
    // cap (budget_ok). Deterministic booleans (sorted insertion, tie
    // rules pinned) — the 20i/ann_recall_atk discipline.
    "ann_hnsw" ->
      """SELECT * FROM (VALUES
        |  ('hnsw', true, true, true),
        |  ('ivf_budget_ref', true, true, true))
        |  AS t(method, planted_ok, recall_ok, budget_ok)
        |ORDER BY method""".stripMargin,
    // Same dense-cluster recall regime as ann_recall_atk, for the PQ
    // compressed-domain scan + exact re-rank.
    "ann_pq" ->
      """SELECT * FROM (VALUES
        |  ('pq', true, true)) AS t(method, planted_ok, recall_ok)
        |ORDER BY method""".stripMargin,
    // Correlated-sub-space contrast: axis-aligned PQ must drown in
    // same-cell ADC ties (recall <= 0.60 => contract_ok) while the
    // rotated pipeline clears 0.90. Both booleans pinned.
    "ann_opq" ->
      """SELECT * FROM (VALUES
        |  ('opq', true, true),
        |  ('pq_plain', true, true)) AS t(method, planted_ok, contract_ok)
        |ORDER BY method""".stripMargin,
    // Trained-OPQ distortion contrast on the block-structured corpus:
    // a data-blind rotation is >= 2x the aligned reference, trained
    // (PCA + eigenvalue-allocation init, alternating minimization)
    // lands <= 0.75x fixed and <= 3.5x aligned. Deterministic booleans.
    "ann_opq_trained" ->
      """SELECT * FROM (VALUES
        |  ('fixed_insufficient', true),
        |  ('trained_beats_fixed', true),
        |  ('trained_near_aligned', true)) AS t(contract, ok)
        |ORDER BY contract""".stripMargin,
    // Same contrast through the composed IVF-PQ index: the coarse
    // filter survives concentrated variance, the in-list PQ codes do
    // not (plain recall <= 0.60 => contract_ok) — rotated holds >= 0.90.
    "ann_opq_ivf" ->
      """SELECT * FROM (VALUES
        |  ('opq_ivfpq', true, true),
        |  ('plain_ivfpq', true, true)) AS t(method, planted_ok, contract_ok)
        |ORDER BY method""".stripMargin,
    // Planted duplicate shares coarse list and PQ code word -> must be
    // the top-1 IVF-PQ neighbor at cosine 1.0. Probe set = the shared
    // gate rule (every 50th id under the 20k workload cap — inactive
    // at sf <= 1, pins probes at 400 beyond: Ann.ProbeIdCap).
    "ann_ivf_pq" ->
      """SELECT vec_id AS probe_id, vec_id + 1000000 AS neighbor_id, CAST(1.0 AS DOUBLE) AS cosine
        |FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 20000 ORDER BY 1""".stripMargin,
    // Each probe's exact duplicate is planted in the corpus; the index
    // must return it as the top-1 neighbor at cosine 1.0.
    "ann_lsh" ->
      """SELECT vec_id AS probe_id, vec_id + 1000000 AS neighbor_id, CAST(1.0 AS DOUBLE) AS cosine
        |FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 20000 ORDER BY 1""".stripMargin,
    "ann_ivf" ->
      """SELECT vec_id AS probe_id, vec_id + 1000000 AS neighbor_id, CAST(1.0 AS DOUBLE) AS cosine
        |FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 20000 ORDER BY 1""".stripMargin,
    "ann_ivf_delete" ->
      """SELECT * FROM (VALUES
        |  ('after', true, true),
        |  ('before', true, true),
        |  ('census', true, true)) AS t(phase, planted_ok, ok)
        |ORDER BY phase""".stripMargin,
    "ann_ivf_incremental" ->
      """SELECT * FROM (VALUES
        |  ('fresh', true, true),
        |  ('stale', true, true)) AS t(phase, planted_ok, ok)
        |ORDER BY phase""".stripMargin,
    // Frozen determinism pin (training output is not SQL-expressible).
    // modelIo trains on the sf-INDEPENDENT RingData slice, so these six
    // numbers are constants at every scale factor; the pin verifies
    // LibSVM-format serializer stability and bit-determinism of the SMO
    // solve across JVMs. Values recomputed 2026-08-12.
    "svm_model_io" ->
      """SELECT * FROM (VALUES
        |  ('model_chars', CAST(48464 AS DOUBLE)),
        |  ('n_binaries', CAST(45 AS DOUBLE)),
        |  ('nr_class', CAST(10 AS DOUBLE)),
        |  ('pred_agree', CAST(1.0 AS DOUBLE)),
        |  ('roundtrip_sv', CAST(192 AS DOUBLE)),
        |  ('total_sv', CAST(192 AS DOUBLE))) AS t(stat, value)
        |ORDER BY stat""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH g AS (
        |  SELECT doc_id, list_distinct(list_filter([substring(s, i, 3) FOR i IN generate_series(1, greatest(length(s) - 2, 1))], x -> length(x) = 3)) AS grams
        |  FROM (SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS s FROM documents) t
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(length(list_intersect(a.grams, b.grams)) AS DOUBLE) / length(list_distinct(list_concat(a.grams, b.grams))), 4) AS jaccard
        |FROM g a JOIN g b ON b.doc_id = a.doc_id + 1 ORDER BY id_a""".stripMargin,
    "ann_bruteforce" ->
      """WITH p AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 20000),
        |sc AS (
        |  SELECT p.probe_id, e.vec_id,
        |    round(CASE WHEN sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * sqrt(list_sum(list_transform(p.pv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0 THEN 0.0
        |      ELSE list_sum(list_transform(list_zip(e.embedding, p.pv), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
        |        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * sqrt(list_sum(list_transform(p.pv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) END, 6) AS cosine
        |  FROM embeddings e, p WHERE e.vec_id <> p.probe_id
        |), r AS (
        |  SELECT probe_id, vec_id, cosine, CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rk FROM sc
        |)
        |SELECT probe_id, rk, vec_id AS neighbor_id, cosine FROM r WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin,
    "text_langid" ->
      """WITH t AS (SELECT lang AS actual, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |s AS (SELECT actual,
        |  length(list_filter(toks, x -> x IN ('the', 'and', 'of', 'with'))) AS s_en,
        |  length(list_filter(toks, x -> x IN ('el', 'la', 'los', 'de'))) AS s_es,
        |  length(list_filter(toks, x -> x IN ('der', 'die', 'und', 'das'))) AS s_de,
        |  length(list_filter(toks, x -> x IN ('le', 'la', 'les', 'des'))) AS s_fr,
        |  length(list_filter(toks, x -> x IN ('的', '了', '是', '在'))) AS s_zh
        |  FROM t),
        |p AS (SELECT actual, CASE
        |  WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) = 0 THEN 'unknown'
        |  WHEN s_en = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'en'
        |  WHEN s_es = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'es'
        |  WHEN s_de = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'de'
        |  WHEN s_fr = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'fr'
        |  ELSE 'zh' END AS pred FROM s)
        |SELECT pred, actual, count(*) AS n FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "text_quality" ->
      """SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars_actual,
        |  CAST(length(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS INTEGER) AS n_tokens,
        |  round(CAST(length(regexp_extract_all(text, '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]')) AS DOUBLE) / greatest(length(text), 1), 4) AS punct_ratio,
        |  round(CAST(length(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / greatest(length(text), 1), 4) AS digit_ratio,
        |  round(CAST(length(regexp_extract_all(text, '[A-Z]')) AS DOUBLE) / greatest(length(text), 1), 4) AS upper_ratio,
        |  round(CAST(length(list_filter(list_filter(string_split_regex(text, '\s+'), x -> x <> ''), x -> lower(x) IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'on'))) AS DOUBLE)
        |    / greatest(length(list_filter(string_split_regex(text, '\s+'), x -> x <> '')), 1), 4) AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(length(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS INTEGER) AS ws_tokens,
        |  CAST(length(regexp_extract_all(text, '[A-Za-z]+')) + length(regexp_extract_all(text, '[0-9]+')) + length(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS INTEGER) AS bpeish_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars_actual
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(ascii(substring(s, i, 1)) AS BIGINT) FOR i IN generate_series(1, length(s))]), (a, x) -> (a * 31 + x) % 1000000007) AS fp_roll,
        |  substring(md5(s), 1, 16) AS fp_md5
        |FROM (SELECT doc_id, lower(regexp_replace(text, '\s+', ' ', 'g')) AS s FROM documents) t ORDER BY doc_id""".stripMargin,
    // Word-3-gram MULTISET stats (multiplicity matters — this is the
    // repetition signal, not the dedup shingle set); the planted
    // prefix×5 docs land in n_docs_repetitive via exact int arithmetic.
    "text_repetition" ->
      """WITH planted AS (
        |  SELECT doc_id, lang, lower(text) AS text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 4000000 AS doc_id, lang,
        |    trim(repeat(array_to_string(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')[1:10], ' ') || ' ', 5)) AS text
        |  FROM documents
        |  WHERE doc_id % 10 = 0 AND length(regexp_extract_all(text, '\S+')) >= 10
        |), tk AS (
        |  SELECT doc_id, lang, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM planted
        |), g AS (
        |  SELECT doc_id, lang, unnest([array_to_string(t[i:i+2], ' ') FOR i IN generate_series(1, length(t) - 2)]) AS gram
        |  FROM tk WHERE length(t) >= 3
        |), pg AS (
        |  SELECT doc_id, lang, gram, count(*) AS c FROM g GROUP BY 1, 2, 3
        |), pd AS (
        |  SELECT doc_id, lang, sum(c) AS total, count(*) AS dist, max(c) AS maxc FROM pg GROUP BY 1, 2
        |)
        |SELECT lang, count(*) AS n_docs, CAST(sum(total) AS BIGINT) AS total_grams,
        |  CAST(sum(dist) AS BIGINT) AS distinct_grams,
        |  floor((1.0 - CAST(sum(dist) AS DOUBLE) / CAST(sum(total) AS DOUBLE)) * 10000 + 0.5) / 10000 AS rep_ratio,
        |  CAST(sum(CASE WHEN (total - dist) * 5 > total THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_repetitive,
        |  floor(max(CAST(maxc AS DOUBLE) / CAST(total AS DOUBLE)) * 10000 + 0.5) / 10000 AS max_top_share
        |FROM pd GROUP BY lang ORDER BY lang""".stripMargin,
    // Corpus vocab counts -> rare set (tf <= 2) -> per-doc rare counts
    // -> lang rollup; the nonce plants are frequency-1 by construction.
    "text_rare_tokens" ->
      """WITH planted AS (
        |  SELECT doc_id, lang, lower(text) AS text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 6000000 AS doc_id, lang,
        |    lower(text) || ' xq' || CAST(doc_id AS VARCHAR) || 'za xq' || CAST(doc_id AS VARCHAR) || 'zb' AS text
        |  FROM documents WHERE doc_id % 25 = 0
        |), tk AS (
        |  SELECT doc_id, lang, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok FROM planted
        |), v AS (
        |  SELECT tok, count(*) AS tf FROM tk GROUP BY 1
        |), r AS (SELECT tok FROM v WHERE tf <= 2
        |), pd AS (
        |  SELECT tk.doc_id, tk.lang, count(*) AS n_rare FROM tk JOIN r USING (tok) GROUP BY 1, 2
        |)
        |SELECT a.lang, count(*) AS n_docs,
        |  CAST(sum(coalesce(pd.n_rare, 0)) AS BIGINT) AS rare_occurrences,
        |  CAST(sum(CASE WHEN coalesce(pd.n_rare, 0) >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_flagged
        |FROM (SELECT doc_id, lang FROM planted) a LEFT JOIN pd ON a.doc_id = pd.doc_id AND a.lang = pd.lang
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Pattern strings are the SAME RE2-safe dialect Spark runs
    // (graft.text.Pii.Categories) — both engines must agree
    // match-for-match on counts, matched docs, redacted chars and the
    // zero residual after the full sequential redaction.
    "text_pii_scrub" -> PiiScrubOracle,
    "mm_metadata" ->
      """SELECT 'fake/image' AS mime, ((doc_id % 16) * 64 + 64) >= 512 AS is_wide, count(*) AS n,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |  CAST(max((doc_id % 9) * 64 + 64) AS INTEGER) AS max_height
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // The stub decode is a 16-bin byte histogram (L1-normalized): bin of
    // a byte = its HIGH NIBBLE = the odd-position chars of hex(payload),
    // so the whole decode→feature→summary path is SQL-reproducible.
    // Float32 division on both sides keeps the doubles bit-comparable.
    // REAL PPM decode: the engine parses genuine P6 bytes; the oracle
    // never touches bytes — it recomputes expected output from the
    // image GENERATION formula (raster byte i = (id*31+i*7)%256,
    // w=2+id%6, h=2+id%4; id%13=0 payloads truncated => malformed).
    // A parser off by one header byte shifts every raster value and
    // the histograms diverge.
    // Real-codec gate: the oracle recomputes the PNG round-trip's exact
    // per-channel pixel sums from the GENERATION formula (pixel (x,y)
    // channel c value = (id*31 + c*53) % 128 + 16 + 2x + 3y — a smooth
    // gradient, JPEG-friendly by design; dims w=4+id%5, h=3+id%4) —
    // the engine only matches if javax.imageio decoded the PNG it
    // encoded bit-exactly; JPEG leg pinned to exact dims + the
    // bounded-distortion boolean (true for every well-formed image).
    // id%13 payloads truncated to the 8-byte signature => ok=false.
    "mm_jpeg" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, CAST(4 + doc_id % 5 AS INTEGER) AS w,
        |         CAST(3 + doc_id % 4 AS INTEGER) AS h
        |  FROM documents
        |), series AS (SELECT unnest(generate_series(0, 47)) AS p),
        |sums AS (
        |  SELECT media_id, any_value(w) AS w, any_value(h) AS h,
        |    CAST(sum((media_id*31) % 128 + 16 + 2*(p % w) + 3*(p // w)) AS BIGINT) AS r_sum,
        |    CAST(sum((media_id*31 + 53) % 128 + 16 + 2*(p % w) + 3*(p // w)) AS BIGINT) AS g_sum,
        |    CAST(sum((media_id*31 + 106) % 128 + 16 + 2*(p % w) + 3*(p // w)) AS BIGINT) AS b_sum
        |  FROM m JOIN series ON p < w*h WHERE media_id % 13 <> 0
        |  GROUP BY media_id
        |)
        |SELECT media_id, true AS ok, w AS width, h AS height,
        |  r_sum, g_sum, b_sum, true AS jpeg_ok,
        |  w AS jpeg_width, h AS jpeg_height, true AS jpeg_close
        |FROM sums
        |UNION ALL
        |SELECT media_id, false, 0, 0, 0, 0, 0, false, 0, 0, false
        |FROM m WHERE media_id % 13 = 0
        |ORDER BY media_id""".stripMargin,
    "mm_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, CAST(2 + doc_id % 6 AS INTEGER) AS w,
        |         CAST(2 + doc_id % 4 AS INTEGER) AS h
        |  FROM documents
        |), series AS (SELECT unnest(generate_series(0, 125)) AS i),
        |bins AS (
        |  SELECT media_id, w, h, ((media_id*31 + i*7) % 256) // 16 AS bin
        |  FROM m JOIN series ON i < w*h*3 WHERE media_id % 13 <> 0
        |), c AS (
        |  SELECT media_id, any_value(w) AS w, any_value(h) AS h, bin, count(*) AS cnt
        |  FROM bins GROUP BY media_id, bin
        |), pk AS (
        |  SELECT media_id, w AS width, h AS height,
        |    floor(max(cnt) * 10000.0 / (w*h*3) + 0.5) / 10000.0 AS peak
        |  FROM c GROUP BY media_id, w, h
        |)
        |SELECT media_id, true AS ok, width, height, peak FROM pk
        |UNION ALL
        |SELECT media_id, false, 0, 0, CAST(0.0 AS DOUBLE) FROM m WHERE media_id % 13 = 0
        |ORDER BY media_id""".stripMargin,
    // Frame boundaries mirror Multimodal.sampleFrames exactly (integer
    // size = max(n/4, 1); last frame absorbs the tail); each frame's
    // high-nibble histogram is rebuilt from the odd hex positions of
    // its byte range. Empty frames (payload shorter than the frame
    // grid) surface with peak 0.0 via the LEFT JOIN.
    // Perceptual average-hash dedup: the oracle regenerates the PPM
    // raster arithmetically (pixel byte = (id*31 + i*7) % 256, dims
    // from the same id mod rules as ppmTable) and recomputes the exact
    // integer aHash — bit p set iff gray(p)*nPixels > sum(gray) — so a
    // decode bug, a packing bug, or a hash-group miscount all surface
    // as value diffs. id % 13 == 0 payloads are truncated => ok=false.
    "mm_phash" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    (doc_id % 6 + 2)::BIGINT AS w, (doc_id % 4 + 2)::BIGINT AS h,
        |    (doc_id % 13 = 0) AS malformed
        |  FROM documents
        |), px AS (
        |  SELECT media_id, malformed, w*h AS n,
        |    [ (media_id*31 + (3*p)*7) % 256 + (media_id*31 + (3*p+1)*7) % 256 + (media_id*31 + (3*p+2)*7) % 256
        |      FOR p IN generate_series(0, w*h - 1) ] AS gray
        |  FROM m
        |), hs AS (
        |  SELECT media_id, NOT malformed AS ok,
        |    CASE WHEN malformed THEN NULL ELSE
        |      list_sum([ CASE WHEN gray[p+1] * n > list_sum(gray) THEN (1::BIGINT << p) ELSE 0::BIGINT END
        |                 FOR p IN generate_series(0, n - 1) ])
        |    END AS phash
        |  FROM px
        |)
        |SELECT media_id, ok, phash,
        |  CASE WHEN ok THEN count(*) OVER (PARTITION BY phash) ELSE 0 END AS n_same
        |FROM hs ORDER BY media_id""".stripMargin,
    // Banding (4 bands over each size class's occupied bits) is
    // pigeonhole-COMPLETE for hamming ≤ 3, so the planted 1-flip and
    // 3-flip twins (id-arithmetic masks, pairwise-distinct positions
    // mod the image's own npx) must all surface at their exact
    // distance: recall is structurally 1.0 and n_planted is the
    // ok-image census (id % 13 truncation rule, as mm_phash).
    "mm_phash_near" ->
      """WITH okn AS (SELECT count(*) AS n FROM documents WHERE doc_id % 13 <> 0)
        |SELECT tier, n AS n_planted, n AS n_found, TRUE AS recall_ok
        |FROM okn, (VALUES ('flip1'), ('flip3')) AS t(tier)
        |ORDER BY tier""".stripMargin,
    "mm_frames" ->
      """WITH h AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents
        |), fr AS (
        |  SELECT media_id, hx, n, f, greatest(n // 4, 1) AS sz FROM h, (SELECT unnest(generate_series(0, 3)) AS f)
        |), rng AS (
        |  SELECT media_id, hx, f,
        |    least(f * sz, n) AS b0,
        |    CASE WHEN f = 3 THEN n ELSE least(least(f * sz, n) + sz, n) END AS b1
        |  FROM fr
        |), nb AS (
        |  SELECT media_id, f, b1 - b0 AS flen,
        |    unnest([substr(hx, 2 * (b0 + i) + 1, 1) FOR i IN generate_series(0, b1 - b0 - 1)]) AS nib
        |  FROM rng WHERE b1 > b0
        |), c AS (
        |  SELECT media_id, f, any_value(flen) AS flen, nib, count(*) AS cnt FROM nb GROUP BY media_id, f, nib
        |), pk AS (
        |  SELECT media_id, f, round(CAST(CAST(max(cnt) AS FLOAT) / CAST(any_value(flen) AS FLOAT) AS DOUBLE), 4) AS peak
        |  FROM c GROUP BY media_id, f
        |)
        |SELECT r.media_id AS media_id, CAST(r.f AS INTEGER) AS frame, coalesce(pk.peak, 0.0) AS peak
        |FROM rng r LEFT JOIN pk ON r.media_id = pk.media_id AND r.f = pk.f
        |ORDER BY media_id, frame""".stripMargin,
    // mm_frames' peak CTE (bit-identical by that oracle) + lag:
    // identical IEEE subtraction of identical doubles ⇒ identical cuts.
    "mm_scene_cut" ->
      """WITH h AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents
        |), fr AS (
        |  SELECT media_id, hx, n, f, greatest(n // 4, 1) AS sz FROM h, (SELECT unnest(generate_series(0, 3)) AS f)
        |), rng AS (
        |  SELECT media_id, hx, f,
        |    least(f * sz, n) AS b0,
        |    CASE WHEN f = 3 THEN n ELSE least(least(f * sz, n) + sz, n) END AS b1
        |  FROM fr
        |), nb AS (
        |  SELECT media_id, f, b1 - b0 AS flen,
        |    unnest([substr(hx, 2 * (b0 + i) + 1, 1) FOR i IN generate_series(0, b1 - b0 - 1)]) AS nib
        |  FROM rng WHERE b1 > b0
        |), c AS (
        |  SELECT media_id, f, any_value(flen) AS flen, nib, count(*) AS cnt FROM nb GROUP BY media_id, f, nib
        |), pk AS (
        |  SELECT media_id, f, round(CAST(CAST(max(cnt) AS FLOAT) / CAST(any_value(flen) AS FLOAT) AS DOUBLE), 4) AS peak
        |  FROM c GROUP BY media_id, f
        |), pk2 AS (
        |  SELECT r.media_id, r.f AS frame, coalesce(pk.peak, 0.0) AS peak
        |  FROM rng r LEFT JOIN pk ON r.media_id = pk.media_id AND r.f = pk.f
        |), l AS (
        |  SELECT *, lag(peak) OVER (PARTITION BY media_id ORDER BY frame) AS prev FROM pk2
        |)
        |SELECT media_id, count(*) AS n_frames,
        |  CAST(sum(CASE WHEN prev IS NOT NULL AND abs(peak - prev) > 0.03 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
        |  CAST(sum(CASE WHEN prev IS NOT NULL AND abs(peak - prev) > 0.03 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_segments
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,
    // Expected demux+decode output from the AVI generation formula
    // (codec-free): nFrames = 3 + id%3, dims = (8 + id%5, 6 + id%4),
    // exactly one planted scene cut unless id%7 == 0 (flat video) or
    // id%13 == 0 (truncated container → ok=false zero row). The
    // engine can only reproduce n_cuts by actually decoding frames —
    // the cut detector runs on decoded pixel luminance.
    "mm_video" ->
      """SELECT doc_id AS media_id,
        |  (doc_id % 13 <> 0) AS ok,
        |  CAST(CASE WHEN doc_id % 13 = 0 THEN 0 ELSE 3 + doc_id % 3 END AS BIGINT) AS n_frames,
        |  CAST(CASE WHEN doc_id % 13 = 0 THEN 0 ELSE 8 + doc_id % 5 END AS BIGINT) AS width,
        |  CAST(CASE WHEN doc_id % 13 = 0 THEN 0 ELSE 6 + doc_id % 4 END AS BIGINT) AS height,
        |  CAST(CASE WHEN doc_id % 13 = 0 OR doc_id % 7 = 0 THEN 0 ELSE 1 END AS BIGINT) AS n_cuts
        |FROM documents ORDER BY media_id""".stripMargin,
    // Expected decode output from the WAV generation formula: sample i
    // of clip id is (id*31 + i*7) mod 256; 8-bit mono PCM at 8 kHz.
    "mm_audio" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, CAST(64 + (doc_id % 50) * 8 AS BIGINT) AS n FROM documents
        |)
        |SELECT media_id, true AS ok, 8000 AS sample_rate, n AS n_samples,
        |  n * 1000 // 8000 AS duration_ms,
        |  CAST(list_sum([abs(((media_id * 31 + i * 7) % 256) - 128) FOR i IN generate_series(0, n - 1)]) AS BIGINT) AS loudness
        |FROM m WHERE media_id % 13 <> 0
        |UNION ALL
        |SELECT media_id, false, 0, 0, 0, 0 FROM m WHERE media_id % 13 = 0
        |ORDER BY media_id""".stripMargin,
    // REAL PPM resize: decode -> nearest-neighbor to 4x4 (src pixel
    // (x*w//4, y*h//4)) -> P6 re-encode. Oracle recomputes the checksum
    // from the generation formula + the same floor rule: resampled
    // raster byte (x,y,c) = (id*31 + (((y*h//4)*w + x*w//4)*3 + c)*7)
    // % 256; re-encoded payload = 11 header bytes ("P6\n4 4\n255\n",
    // byte sum 456) + 48 raster bytes.
    "mm_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, 2 + doc_id % 6 AS w, 2 + doc_id % 4 AS h
        |  FROM documents
        |), grid AS (
        |  SELECT i // 12 AS y, (i // 3) % 4 AS x, i % 3 AS c
        |  FROM (SELECT unnest(generate_series(0, 47)) AS i)
        |), s AS (
        |  SELECT media_id,
        |    456 + sum((media_id*31 + (((y*h//4)*w + x*w//4)*3 + c)*7) % 256) AS byte_sum
        |  FROM m, grid WHERE media_id % 13 <> 0 GROUP BY media_id
        |)
        |SELECT media_id, true AS ok, CAST(59 AS INTEGER) AS n_bytes,
        |  CAST(byte_sum AS BIGINT) AS byte_sum FROM s
        |UNION ALL
        |SELECT media_id, false, 0, 0 FROM m WHERE media_id % 13 = 0
        |ORDER BY media_id""".stripMargin,
    // Composite pipeline funnel: dedup keepers + quality gates + langid
    // rebuilt stage by stage from the already-oracle-validated fragments.
    "corpus_filter" ->
      """WITH k AS (SELECT md5(lower(text)) AS h, min(doc_id) AS keep_id FROM documents GROUP BY 1),
        |s AS (
        |  SELECT d.doc_id, k.keep_id,
        |    list_filter(string_split_regex(d.text, '\s+'), x -> x <> '') AS toks,
        |    list_filter(string_split_regex(lower(d.text), '\s+'), x -> x <> '') AS ltoks,
        |    round(CAST(length(regexp_extract_all(d.text, '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]')) AS DOUBLE) / greatest(length(d.text), 1), 4) AS punct_ratio,
        |    round(CAST(length(regexp_extract_all(d.text, '[0-9]')) AS DOUBLE) / greatest(length(d.text), 1), 4) AS digit_ratio
        |  FROM documents d JOIN k ON md5(lower(d.text)) = k.h
        |), sc AS (
        |  SELECT doc_id, keep_id, length(toks) AS n_tokens, punct_ratio, digit_ratio,
        |    length(list_filter(ltoks, x -> x IN ('the', 'and', 'of', 'with'))) AS s_en,
        |    length(list_filter(ltoks, x -> x IN ('el', 'la', 'los', 'de'))) AS s_es,
        |    length(list_filter(ltoks, x -> x IN ('der', 'die', 'und', 'das'))) AS s_de,
        |    length(list_filter(ltoks, x -> x IN ('le', 'la', 'les', 'des'))) AS s_fr,
        |    length(list_filter(ltoks, x -> x IN ('的', '了', '是', '在'))) AS s_zh
        |  FROM s
        |), fl AS (
        |  SELECT n_tokens,
        |    CASE WHEN doc_id = keep_id THEN 1 ELSE 0 END AS keeper,
        |    CASE WHEN n_tokens >= 10 AND punct_ratio <= 0.2 AND digit_ratio <= 0.2 THEN 1 ELSE 0 END AS quality,
        |    CASE WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) > 0 AND s_en = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 1 ELSE 0 END AS is_en
        |  FROM sc
        |)
        |SELECT count(*) AS n_total,
        |  CAST(sum(keeper) AS BIGINT) AS n_after_dedup,
        |  CAST(sum(keeper * quality) AS BIGINT) AS n_after_quality,
        |  CAST(sum(keeper * quality * is_en) AS BIGINT) AS n_retained,
        |  round(avg(CASE WHEN keeper * quality * is_en = 1 THEN n_tokens END), 2) AS avg_tokens_retained
        |FROM fl""".stripMargin,
    // Token-aligned 8-gram collision scan vs the probe set (first 8
    // tokens of every 37th doc); the %74 plants wrap the probe phrase
    // in filler, so the source doc AND the plant must both hit.
    "corpus_decontaminate" ->
      """WITH base AS (
        |  SELECT doc_id, lower(text) AS text FROM documents
        |), tk0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM base
        |), planted AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 5000000 AS doc_id,
        |    'decon filler opens here ' || array_to_string(t[1:8], ' ') || ' and filler closes' AS text
        |  FROM tk0 WHERE doc_id % 74 = 0 AND length(t) >= 8
        |), tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM planted
        |  WHERE length(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) >= 8
        |), p AS (
        |  SELECT doc_id AS bench_doc_id, array_to_string(t[1:8], ' ') AS gram
        |  FROM tk WHERE doc_id % 37 = 0 AND doc_id < 1000000
        |), g AS (
        |  SELECT DISTINCT doc_id, unnest([array_to_string(t[i:i+7], ' ') FOR i IN generate_series(1, length(t) - 7)]) AS gram
        |  FROM tk
        |)
        |SELECT bench_doc_id, CAST(count(*) AS BIGINT) AS n_hit_docs, count(*) > 1 AS leaked
        |FROM g JOIN p USING (gram) GROUP BY 1 ORDER BY 1""".stripMargin,
    "corpus_pack" ->
      """WITH d AS (
        |  SELECT doc_id, lang, doc_id % 4 AS bucket,
        |    length(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, bucket, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang, bucket ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d
        |)
        |SELECT lang, bucket, CAST(floor((cum - n_tokens) / 2000.0) AS INT) AS shard,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // identical to corpus_pack: the read-back census must equal the
    // manifest exactly
    "corpus_pack_write" ->
      """WITH d AS (
        |  SELECT doc_id, lang, doc_id % 4 AS bucket,
        |    length(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, bucket, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang, bucket ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d
        |)
        |SELECT lang, bucket, CAST(floor((cum - n_tokens) / 2000.0) AS INT) AS shard,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "corpus_split" ->
      """WITH s AS (
        |  SELECT lang,
        |    CASE WHEN ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 < 1717986918 THEN 'train'
        |         WHEN ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 < 1932735283 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents
        |), c AS (SELECT lang, split, count(*) AS n_docs FROM s GROUP BY 1, 2)
        |SELECT lang, split, n_docs,
        |  round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY lang), 4) AS frac
        |FROM c ORDER BY 1, 2""".stripMargin,
    // Achievable total T = min(n_l / w_l); limiting stratum kept whole,
    // others thinned to w_l*T/n_l via the same LCG as corpus_split.
    "corpus_mix_tokens" -> graft.text.TokenMix.oracleSql,
    "corpus_mix_tokens_weighted" -> graft.text.TokenMix.oracleSqlWeighted,
    "corpus_sample_tokens" -> graft.text.TokenSample.oracleSql,
    "corpus_mix" ->
      """WITH w(lang, w) AS (VALUES
        |  ('de', CAST(0.10 AS DOUBLE)), ('en', CAST(0.50 AS DOUBLE)), ('es', CAST(0.20 AS DOUBLE)),
        |  ('fr', CAST(0.10 AS DOUBLE)), ('zh', CAST(0.10 AS DOUBLE))
        |), c AS (
        |  SELECT lang, count(*) AS n_before FROM documents GROUP BY 1
        |), r AS (
        |  SELECT c.lang, c.n_before, w.w,
        |    min(CAST(c.n_before AS DOUBLE) / w.w) OVER () AS t_max
        |  FROM c JOIN w USING (lang)
        |), r2 AS (
        |  SELECT lang, n_before, w,
        |    CAST(floor(least(CAST(1.0 AS DOUBLE), w * t_max / n_before) * 2147483648) AS BIGINT) AS thresh
        |  FROM r
        |), k AS (
        |  SELECT d.lang, count(*) AS n_kept
        |  FROM documents d JOIN r2 ON d.lang = r2.lang
        |  WHERE ((d.doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 < r2.thresh
        |  GROUP BY 1
        |)
        |SELECT r2.lang, CAST(r2.n_before AS BIGINT) AS n_before, CAST(k.n_kept AS BIGINT) AS n_kept,
        |  floor(r2.w * 10000 + 0.5) / 10000 AS target_share,
        |  floor(CAST(k.n_kept AS DOUBLE) / (SELECT sum(n_kept) FROM k) * 10000 + 0.5) / 10000 AS realized_share
        |FROM r2 JOIN k USING (lang) ORDER BY lang""".stripMargin,
    // Upsampling mirror of corpus_mix: MAX anchors, greatest(1, r)
    // clamps the anchor's IEEE drift, emitted = n*floor(r) + the
    // LCG-thinned fractional epoch.
    "corpus_mix_up" ->
      """WITH w(lang, w) AS (VALUES
        |  ('de', CAST(0.10 AS DOUBLE)), ('en', CAST(0.50 AS DOUBLE)), ('es', CAST(0.20 AS DOUBLE)),
        |  ('fr', CAST(0.10 AS DOUBLE)), ('zh', CAST(0.10 AS DOUBLE))
        |), c AS (
        |  SELECT lang, count(*) AS n_before FROM documents GROUP BY 1
        |), r AS (
        |  SELECT c.lang, c.n_before, w.w,
        |    max(CAST(c.n_before AS DOUBLE) / w.w) OVER () AS t_max
        |  FROM c JOIN w USING (lang)
        |), r2 AS (
        |  SELECT lang, n_before, w,
        |    greatest(CAST(1.0 AS DOUBLE), w * t_max / n_before) AS r
        |  FROM r
        |), r3 AS (
        |  SELECT lang, n_before, w, r, CAST(floor(r) AS BIGINT) AS k_full,
        |    CAST(floor((r - floor(r)) * 2147483648) AS BIGINT) AS thresh
        |  FROM r2
        |), k AS (
        |  SELECT d.lang, count(*) AS n_frac
        |  FROM documents d JOIN r3 ON d.lang = r3.lang
        |  WHERE ((d.doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 < r3.thresh
        |  GROUP BY 1
        |), e AS (
        |  SELECT r3.lang, r3.n_before, r3.r, r3.w,
        |    r3.n_before * r3.k_full + coalesce(k.n_frac, 0) AS n_emitted
        |  FROM r3 LEFT JOIN k USING (lang)
        |)
        |SELECT lang, CAST(n_before AS BIGINT) AS n_before, CAST(n_emitted AS BIGINT) AS n_emitted,
        |  floor(r * 10000 + 0.5) / 10000 AS epochs,
        |  floor(w * 10000 + 0.5) / 10000 AS target_share,
        |  floor(CAST(n_emitted AS DOUBLE) / (SELECT sum(n_emitted) FROM e) * 10000 + 0.5) / 10000 AS realized_share
        |FROM e ORDER BY lang""".stripMargin,
    "stream_dedup" ->
      """SELECT source, count(DISTINCT md5(lower(text))) AS n_unique
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // Closed-form replay of the three watermark-dedup rules.
    "stream_dedup_watermark" -> graft.streaming.WatermarkDedup.oracleSql,
    // Bounded streaming scrub == the batch scrub: identical audit SQL.
    "stream_pii_scrub" -> PiiScrubOracle,
    // Stream-static join on a bounded input == the batch join.
    "stream_join" ->
      """SELECT c_mktsegment, count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM events e JOIN customer c ON e.user_id % 100 = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Stream-stream attribution join on a bounded replay == the batch
    // event self-join with the same key + time-range predicate.
    "stream_stream_join" ->
      """SELECT v.user_id, count(*) AS n_attributed,
        |  round(sum(p.value), 2) AS attributed_value
        |FROM events v JOIN events p
        |  ON v.user_id = p.user_id
        |  AND v.event_type = 'view' AND p.event_type = 'purchase'
        |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Left-outer stream-stream join: the batch LEFT JOIN restricted to
    // the watermark-decided region — views whose 1 h match horizon lies
    // within the final global watermark (min of both sides' max ts
    // minus the 2 h delay); later views are still in the join state on
    // a bounded replay, by watermark semantics, so both engines exclude
    // them identically.
    "stream_stream_outer" ->
      """WITH mx AS (
        |  SELECT least(
        |    (SELECT max(ts) FROM events WHERE event_type = 'view'),
        |    (SELECT max(ts) FROM events WHERE event_type = 'purchase')) AS m
        |)
        |SELECT v.user_id, count(*) AS n_rows, count(p.ts) AS n_attributed,
        |  round(sum(coalesce(p.value, 0)), 2) AS attributed_value
        |FROM events v LEFT JOIN events p
        |  ON v.user_id = p.user_id
        |  AND p.event_type = 'purchase'
        |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
        |WHERE v.event_type = 'view'
        |  AND v.ts < (SELECT m - INTERVAL 3 HOUR FROM mx)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // FULL JOIN under the same per-row decided filter: rows carrying a
    // view decided at ts_v < m−3h, purchase-only rows at ts_p < m−3h.
    "stream_stream_full" ->
      """WITH mx AS (
        |  SELECT least(
        |    (SELECT max(ts) FROM events WHERE event_type = 'view'),
        |    (SELECT max(ts) FROM events WHERE event_type = 'purchase'))
        |    - INTERVAL 3 HOUR AS cut
        |), j AS (
        |  SELECT v.user_id AS v_user, v.ts AS ts_v,
        |         p.user_id AS p_user, p.ts AS ts_p
        |  FROM (SELECT * FROM events WHERE event_type = 'view') v
        |  FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |    ON v.user_id = p.user_id
        |    AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
        |)
        |SELECT coalesce(v_user, p_user) AS user_id,
        |  CAST(sum(CASE WHEN ts_v IS NOT NULL AND ts_p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN ts_v IS NOT NULL AND ts_p IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view_only,
        |  CAST(sum(CASE WHEN ts_v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_only
        |FROM j
        |WHERE (ts_v IS NOT NULL AND ts_v < (SELECT cut FROM mx))
        |   OR (ts_v IS NULL AND ts_p < (SELECT cut FROM mx))
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // flatMapGroupsWithState running stats must converge to the plain
    // batch aggregate — the custom state store is an implementation
    // detail, not a semantic.
    "stream_user_stats" ->
      """SELECT user_id, count(*) AS n_events,
        |  floor(sum(value) * 100 + 0.5) / 100 AS total_value,
        |  max(epoch_us(ts)) AS last_seen
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // transformWithState (typed ValueState + TTL) must converge to the
    // SAME batch aggregate as the legacy flatMapGroupsWithState row —
    // the state API is an implementation surface, not a semantic.
    "stream_user_stats_tws" ->
      """SELECT user_id, count(*) AS n_events,
        |  floor(sum(value) * 100 + 0.5) / 100 AS total_value,
        |  max(epoch_us(ts)) AS last_seen
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // timer-closed sessions: with a bounded feed every session goes
    // inactive, so the timer emissions census == the batch aggregate.
    "stream_inactivity_tws" ->
      """SELECT user_id, count(*) AS n_events,
        |  floor(sum(value) * 100 + 0.5) / 100 AS total_value,
        |  max(epoch_us(ts)) - min(epoch_us(ts)) AS span_us
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // map-state counters must converge to the plain two-key census.
    "stream_type_census_tws" ->
      """SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "text_token_budget" ->
      """WITH t AS (
        |  SELECT length(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS t,
        |    length(regexp_extract_all(text, '[A-Za-z]+')) + length(regexp_extract_all(text, '[0-9]+')) + length(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS b,
        |    length(text) AS c
        |  FROM documents
        |)
        |SELECT count(*) AS n_docs,
        |  CAST(sum(t) AS BIGINT) AS total_ws_tokens,
        |  CAST(sum(b) AS BIGINT) AS total_bpeish_tokens,
        |  CAST(sum(c) AS BIGINT) AS total_chars,
        |  round(avg(t), 2) AS avg_ws_tokens,
        |  round(quantile_cont(t, 0.5), 1) AS p50_ws_tokens,
        |  round(quantile_cont(t, 0.9), 1) AS p90_ws_tokens
        |FROM t""".stripMargin,
    // Occurrence-counted word bigrams (repeats within a doc count).
    "text_ngram_counts" ->
      """WITH tk AS (
        |  SELECT list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t FROM documents
        |), g AS (
        |  SELECT unnest([array_to_string(t[i:i+1], ' ') FOR i IN generate_series(1, length(t) - 1)]) AS gram FROM tk
        |)
        |SELECT gram, count(*) AS n FROM g GROUP BY gram ORDER BY n DESC, gram LIMIT 20""".stripMargin,
    "stream_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // session_window merges events strictly closer than the gap, so a
    // diff of exactly 1800s starts a NEW session (>= below), unlike the
    // lag-rule in q_events_sessionize (> 1800).
    "stream_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, ts, value, event_id, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events
        |), f AS (
        |  SELECT user_id, value,
        |    sum(CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) >= 1800 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM e
        |), s AS (
        |  SELECT user_id, session_seq, count(*) AS n_events, round(sum(value), 2) AS total_value FROM f GROUP BY 1, 2
        |)
        |SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events, round(sum(total_value), 2) AS total_value
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // stream_sessionize's census restricted to the watermark-DECIDED
    // region: sessions whose close horizon (last ts + 30 min gap)
    // cleared the final watermark (max ts - 1 h delay) by a 1 s guard
    // — the same cutoff literal the engine-side runner applies
    // (EventTimeSessionsTws.runBounded): 1800 + 3600 + 1 = 5401 s.
    "stream_sessions_etime" ->
      """WITH e AS (
        |  SELECT user_id, ts, value, event_id, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events
        |), f AS (
        |  SELECT user_id, ts, value,
        |    sum(CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) >= 1800 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM e
        |), s AS (
        |  SELECT user_id, session_seq, count(*) AS n_events, round(sum(value), 2) AS total_value, max(epoch_us(ts)) AS last_us FROM f GROUP BY 1, 2
        |)
        |SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events, round(sum(total_value), 2) AS total_value
        |FROM s WHERE last_us <= (SELECT max(epoch_us(ts)) FROM events) - 5401000000
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
