package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, NearDup}

/** IVF index DELETES (SURVEY.md §2c) — the other half of day-2 index
  * maintenance next to [[IvfIncremental]]'s adds: vectors leave a
  * deployed index (GDPR erasure, content takedowns, TTL expiry) far
  * more often than the index retrains. The operable shape is the
  * TOMBSTONE: deletes are an ids-only anti-join against the inverted
  * lists (here materialized; in a serving system a bloom/bitmap side
  * filter at query time until a scheduled compaction folds it in) —
  * per-delete work is ∝ |tombstones|, the quantizer stays frozen, the
  * surviving corpus is never rescanned.
  *
  * Contract (three literal-pinned rows): probes are rotated to cosine
  * 0.97 of the DELETED vectors, so
  *   - `before`: the intact index must return the to-be-deleted
  *     vector as top-1 (the probes genuinely point at them);
  *   - `after`: the tombstoned index must return ZERO deleted ids —
  *     and the new top-1 cosine must fall to ≤ 0.90 (structural: the
  *     nearest survivor is far), so "deleted" can't be faked by
  *     near-duplicate survivors;
  *   - `census`: |index| − |tombstones| rows survive — the anti-join
  *     removed exactly the delete set, nothing else.
  */
object IvfDelete {

  private val DeleteEvery = 25

  /** nProbe default 8 (vs the recall rows' 4): the probes here are
    * 0.97-rotations of NATURAL corpus vectors, whose rotated direction
    * can quantize into a list the target doesn't own — a coarse-recall
    * miss that has nothing to do with deletion. The delete contract
    * isolates TOMBSTONE correctness, so it widens the probe fan until
    * coarse recall stops being the noise floor.
    */
  def deleteContract(spark: SparkSession, sfDir: String,
                     nLists: Int = 16, nProbe: Int = 8,
                     minRate: Double = 0.90): DataFrame = {
    import spark.implicits._
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    NearDup.guardIds(base, "vec_id")
    val doomed = base.filter(pmod(col("vec_id"), lit(DeleteEvery)) === 0)
      .localCheckpoint()
    val tombstones = doomed.select("vec_id")
    val nDel = tombstones.count()

    // rotatedTo outputs UNIT vectors, but the corpus and the Euclidean
    // coarse quantizer live at natural norms — an unscaled probe's
    // nearest-centroid routing is decorrelated from its target's
    // (measured: 0/20 reachability with cos(probe,target)=0.97).
    // Rescale each probe to its target's norm; cosine is unaffected.
    import graft.functions.VectorOps
    val probes = NearDup.rotatedTo(doomed, 0.97)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv_unit"))
      .join(doomed.select(col("vec_id").as("probe_id"),
        sqrt(VectorOps.dot(col("embedding"), col("embedding"))).as("tnorm")), Seq("probe_id"))
      // probe ids offset: keyed_topk excludes vec_id == probe_id rows
      // (the standard self-match filter), and these probes target LIVE
      // corpus ids — unoffset, the contract's own target is filtered
      // out (measured 0/20)
      .select((col("probe_id") + Dedup.PlantOffset).as("probe_id"),
        transform(col("pv_unit"), x => (x * col("tnorm")).cast("float")).as("probe_vec"))
      .localCheckpoint()

    val cent = Ivf.trainCentroids(base, nLists)

    // before: the intact index must find the doomed vectors
    val before = Ivf.queryIndexBounded(cent, base, probes, k = 1, nProbe)
    val beforeHits = before
      .filter(col("neighbor_id") === col("probe_id") - Dedup.PlantOffset).count()
    val beforeRate = if (nDel == 0) 0.0 else beforeHits.toDouble / nDel

    // the tombstone delete: ids-only LEFT ANTI against the lists
    val survivors = base.join(tombstones, Seq("vec_id"), "left_anti")
      .localCheckpoint()
    val after = Ivf.queryIndexBounded(cent, survivors, probes, k = 1, nProbe)
    val deletedReturned = after.join(tombstones,
      after("neighbor_id") === tombstones("vec_id")).count()
    val afterMax = after.agg(coalesce(max("cosine"), lit(0.0))).head().getDouble(0)

    val censusOk = survivors.count() == base.count() - nDel

    Seq(
      ("after", nDel > 0, deletedReturned == 0 && afterMax <= 0.90),
      ("before", nDel > 0, beforeRate >= minRate),
      ("census", nDel > 0, censusOk))
      .toDF("phase", "planted_ok", "ok").orderBy("phase")
  }
}
