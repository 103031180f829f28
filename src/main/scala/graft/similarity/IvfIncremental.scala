package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, NearDup}

/** Incremental IVF index maintenance — the day-2 shape of a deployed
  * vector index (the text twin is `dedup_incremental_indexed`): new
  * vectors are ADDED to an existing index by assigning THE BATCH ONLY
  * against the frozen coarse quantizer — one narrow codegen scan of
  * the batch, no re-clustering, no touch of the existing corpus — and
  * appending to the inverted lists. Per-add work is ∝ batch, which is
  * what makes a continuously-ingesting 100 TB index operable; periodic
  * full retrains (when centroid drift degrades recall) are a separate,
  * scheduled operation, exactly as in the public IVF literature
  * (Faiss's add-vs-train split).
  *
  * Contract: the batch is NEW content (corpus vectors rotated to
  * cosine 0.35 — far from every natural vector), probes are rotated to
  * cosine 0.97 of the INSERTED vectors. The UPDATED index must return
  * the inserted vector as top-1 (`fresh` row — proves the add landed
  * in the right inverted list and is reachable through the standard
  * query path), while the PRE-ADD index must see nothing near the
  * probe (`stale` row: max top-1 cosine ≤ 0.90 — structural, the
  * nearest pre-existing vector sits at ≤ ~0.6) — so the fresh boolean
  * can only be earned by the insertion itself.
  */
object IvfIncremental {

  import Dedup.PlantOffset

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** The incremental add: assign the batch against the FROZEN
    * centroids and append. The existing index rows are untouched —
    * union is plan-level, no shuffle, no rescan of the corpus.
    */
  def addToIndex(index: DataFrame, batch: DataFrame, centroids: DataFrame): DataFrame =
    index.unionByName(Ivf.assign(batch, centroids))

  /** `ann_ivf_incremental` — build on the natural corpus, add a batch
    * of genuinely-new vectors, and pin reachability through the
    * updated (not the stale) index: (phase, planted_ok, ok).
    */
  def incrementalContract(spark: SparkSession, sfDir: String,
                          batchEvery: Int = 20, nLists: Int = 16,
                          nProbe: Int = 4, minRate: Double = 0.90): DataFrame = {
    import spark.implicits._
    val base = emb(spark, sfDir).select("vec_id", "embedding")
    NearDup.guardIds(base, "vec_id")
    // new content: far rotations (cosine 0.35) of every batchEvery-th
    // vector, ids offset — a batch that shares no near-neighbor with
    // the existing corpus
    val newVecs = NearDup.rotatedTo(
        base.filter(pmod(col("vec_id"), lit(batchEvery)) === 0), 0.35)
      .select((col("vec_id") + PlantOffset).as("vec_id"), col("embedding"))
      .localCheckpoint()
    val nBatch = newVecs.count()
    // probes: rotated to cosine 0.97 of the INSERTED vectors (noise
    // direction keys off the offset id — independent of the first
    // rotation's plane)
    val probes = NearDup.rotatedTo(newVecs, 0.97)
      .select((col("vec_id") + PlantOffset).as("probe_id"),
        col("embedding").as("probe_vec"))
      .localCheckpoint()

    val cent = Ivf.trainCentroids(base, nLists)
    // bounded query (probes are contract-bounded): scanning the fresh
    // vector set with the frozen-quantizer key IS scanning the updated
    // inverted lists — row-identical to the join pipeline over the
    // materialized addToIndex output (parity spec-pinned); the join
    // formulation measured 21.8 s warm at sf1, this scan far less at
    // the same answers
    val vectors = base.unionByName(newVecs)
    val fresh = Ivf.queryIndexBounded(cent, vectors, probes, k = 1, nProbe)
    val freshHits = fresh
      .filter(col("neighbor_id") === col("probe_id") - PlantOffset).count()
    val freshRate = if (nBatch == 0) 0.0 else freshHits.toDouble / nBatch

    val stale = Ivf.queryIndexBounded(cent, base, probes, k = 1, nProbe)
    val staleMax = stale.agg(coalesce(max("cosine"), lit(0.0))).head().getDouble(0)

    Seq(
      ("fresh", nBatch > 0, freshRate >= minRate),
      ("stale", nBatch > 0, staleMax <= 0.90))
      .toDF("phase", "planted_ok", "ok").orderBy("phase")
  }
}
