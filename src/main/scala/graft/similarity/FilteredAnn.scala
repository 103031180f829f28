package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Attribute-filtered ANN (SURVEY.md §2c, round-13 verdict #5) — the
  * retrieval-serving day-1 need: a metadata predicate combined with
  * vector search. The predicate must be evaluated INSIDE the IVF list
  * scan, BEFORE top-k ranking — the classic wrong answer is
  * post-filtering: rank top-k first, then drop failures, which returns
  * fewer than k (or zero) rows whenever the nearest neighbors fail a
  * selective predicate, even though plenty of passing candidates sit
  * in the probed lists.
  *
  * Mechanics: [[Ivf.queryIndex]] already joins candidates back to the
  * vector table before ranking — filtering THAT side applies the
  * predicate to every candidate as the lists are scanned (Catalyst
  * pushes it below the cosine + window; for a parquet metadata column
  * it reaches the scan itself), so failing candidates never enter the
  * rank window. The planted contract makes pushed-vs-post observable:
  * each probe's EXACT duplicate (cosine 1.0, the unfiltered top-1)
  * FAILS the predicate, and a rotated cosine-0.97 copy PASSES — the
  * filtered query must return the passing copy, which post-filtering
  * the unfiltered top-1 cannot produce.
  *
  * At 100 TB the shape is unchanged from plain IVF: ids + list ids
  * shuffle, the predicate prunes candidate rows before the embedding
  * join carries any vector bytes into ranking, and a selective
  * predicate REDUCES work rather than multiplying it (the post-filter
  * pattern forces k to be over-provisioned by 1/selectivity).
  */
object FilteredAnn {

  /** Offsets for the two planted copies per probe. Natural vec_ids stay
    * far below both (the [[graft.dedup.Dedup.PlantOffset]] discipline).
    * `private[graft]` so the rate diagnostic ([[graft.tools
    * .FilteredAnnProbe]]) measures the SAME plants, never a drifted
    * hardcoded copy.
    */
  private[graft] val FailOffset = 2000000L
  private[graft] val PassOffset = 3000000L

  /** IVF query with the metadata predicate applied to the candidate
    * (vector-table) side BEFORE ranking. `vectors` must carry the
    * predicate's columns alongside (vec_id, embedding).
    */
  def queryIndexFiltered(cent: DataFrame, index: DataFrame, vectors: DataFrame,
                         probes: DataFrame, k: Int, nProbe: Int,
                         pred: Column): DataFrame =
    Ivf.queryIndex(cent, index, vectors.filter(pred), probes, k, nProbe)

  /** The planted corpus: natural embeddings tagged `allowed = true`;
    * per probe (vec_id % probeEvery == 0) an EXACT duplicate tagged
    * allowed = false (the decoy: nearest overall, fails the filter)
    * and a rotated cosine-`passCos` copy tagged allowed = true (the
    * answer the filtered query must find).
    */
  def taggedCorpus(spark: SparkSession, sfDir: String, probeEvery: Int,
                   passCos: Double): DataFrame = {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val base = e.filter(pmod(col("vec_id"), lit(probeEvery)) === 0)
    val decoys = base
      .select((col("vec_id") + FailOffset).as("vec_id"), col("embedding"),
        lit(false).as("allowed"))
    val answers = graft.dedup.NearDup.rotatedTo(base, passCos)
      .select((col("vec_id") + PassOffset).as("vec_id"), col("embedding"),
        lit(true).as("allowed"))
    e.withColumn("allowed", lit(true))
      .unionByName(decoys).unionByName(answers)
  }

  /** The `ann_filtered` gate: per probe — the filtered top-1 must be
    * the PASSING planted copy, at a cosine strictly below 1 (the
    * excluded exact duplicate really was nearer, so a post-filtering
    * implementation could not have produced this row). The hit bar is
    * a RATE ≥ `minRate` (0.90 — the same contract bar as
    * `ann_near_top1`, and for the same reason: a rotated plant can
    * land outside the probe's nProbe lists, an approximation miss,
    * not a filter bug; measured 1.00 at sf0.01/0.1, 0.995 at sf1).
    * The decoy check stays EXACT (rate == 1): identical vectors
    * always share a centroid, so the unfiltered top-1 is the decoy
    * for every probe. One summary row keeps the oracle a literal pin.
    */
  def filteredTop1(spark: SparkSession, sfDir: String,
                   probeEvery: Int = 50, passCos: Double = 0.97,
                   nLists: Int = 16, nProbe: Int = 4,
                   minRate: Double = 0.90): DataFrame = {
    import spark.implicits._
    // cut the lineage ONCE: the rotated plants are deep HOF expression
    // trees, and Lloyd + assignment + two query pipelines would
    // otherwise re-evaluate them on every scan (measured: minutes at
    // sf1 vs seconds checkpointed)
    val data = taggedCorpus(spark, sfDir, probeEvery, passCos).localCheckpoint()
    // gate probes carry the workload cap (Ann.ProbeIdCap): inactive at
    // sf ≤ 1, keeps probes a workload property beyond
    val probes = Ann.gateProbes(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), probeEvery)
    val cent = Ivf.trainCentroids(data.select("vec_id", "embedding"), nLists)
    val index = Ivf.assign(data, cent)

    val filtered = queryIndexFiltered(cent, index, data, probes, k = 1,
      nProbe, col("allowed"))
    val unfiltered = Ivf.queryIndex(cent, index,
      data.select("vec_id", "embedding"), probes, k = 1, nProbe)

    val nProbes = probes.count()
    val hits = filtered
      .filter(col("neighbor_id") === col("probe_id") + PassOffset &&
        col("cosine") < 1.0).count()
    // the decoy IS what an unfiltered query returns — proof the filter
    // changed the answer rather than the decoy being unreachable
    val decoyTop = unfiltered
      .filter(col("neighbor_id") === col("probe_id") + FailOffset).count()
    Seq(("ivf_filtered",
      nProbes > 0 && hits >= minRate * nProbes,
      nProbes > 0 && decoyTop == nProbes))
      .toDF("method", "filtered_hit_rate_ok", "decoy_is_unfiltered_top1")
  }

  /** The `ann_filtered_hnsw` gate (round-13 verdict #4): the SAME
    * planted decoy/answer contract pushed into the GRAPH tier — the
    * predicate is evaluated inside the beam ([[Hnsw
    * .searchShardsFiltered]]: failing nodes are traversed and charged
    * to the eval cap but never enter the result set), under the same
    * IVF-equal eval budget as `ann_hnsw`. Post-filtering is again
    * structurally unable to produce the pinned answer: each probe's
    * exact-dup decoy is the unfiltered top-1 and FAILS the predicate,
    * so a filtered-after-rank implementation returns the decoy's
    * absence, not the rotated passing copy. Contract bars are RATES
    * (≥ `minRate`) on BOTH legs — a graph search is approximate in
    * both directions, unlike IVF where identical vectors provably
    * share a centroid (the `filteredTop1` decoy leg pins == 1);
    * measured 1.00/1.00 at sf0.01, 1.00/0.995 at sf0.1. budget_ok
    * pins the measured per-probe summed evals ≤ cap × shards — the
    * filtered beam runs longer WITHIN the budget, it does not get a
    * bigger one.
    */
  def filteredTop1Hnsw(spark: SparkSession, sfDir: String,
                       probeEvery: Int = 50, passCos: Double = 0.97,
                       minRate: Double = 0.90,
                       p: Hnsw.Params = Hnsw.Params()): DataFrame = {
    import spark.implicits._
    val data = taggedCorpus(spark, sfDir, probeEvery, passCos).localCheckpoint()
    val probes = Ann.gateProbes(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), probeEvery)
    val corpusN = data.count()
    // the ann_hnsw budget formula: IVF's nProbe/nLists = 1/4 corpus
    // scan fraction split across shards, floored at the graph's
    // minimum working set (Hnsw.annHnsw scaladoc)
    val evalCap = math.max(128, (corpusN / 4 / p.shards).toInt)
    val filteredCands = Hnsw.searchShardsFiltered(data, probes, k = 1, p, evalCap)
      .localCheckpoint()
    val filtered = Hnsw.topK(filteredCands, 1)
    val unfiltered = Hnsw.topK(
      Hnsw.searchShards(data.select("vec_id", "embedding"), probes, k = 1, p,
        evalCap), 1)
    val nProbes = probes.count()
    val hits = filtered
      .filter(col("neighbor_id") === col("probe_id") + PassOffset &&
        col("cosine") < 1.0).count()
    val decoyTop = unfiltered
      .filter(col("neighbor_id") === col("probe_id") + FailOffset).count()
    val maxProbeEvalsRow = filteredCands
      .groupBy("probe_id", "shard").agg(max("evals").as("e"))
      .groupBy("probe_id").agg(sum("e").as("tot"))
      .agg(max("tot")).head()
    val maxProbeEvals =
      if (maxProbeEvalsRow.isNullAt(0)) 0L else maxProbeEvalsRow.getLong(0)
    Seq(("hnsw_filtered",
      nProbes > 0 && hits >= minRate * nProbes,
      nProbes > 0 && decoyTop >= minRate * nProbes,
      maxProbeEvals <= evalCap.toLong * p.shards))
      .toDF("method", "filtered_hit_rate_ok", "decoy_rate_ok", "budget_ok")
  }
}
