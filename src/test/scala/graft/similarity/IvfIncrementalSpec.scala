package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.dedup.NearDup

/** Incremental IVF add (IvfIncremental): contract booleans plus the
  * structural guarantees behind them.
  */
class IvfIncrementalSpec extends SparkSpec {

  test("ann_ivf_incremental: fresh index finds the batch, stale index cannot") {
    val rows = IvfIncremental.incrementalContract(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("fresh", "stale"))
    rows.foreach(r => assert(r.getBoolean(1) && r.getBoolean(2),
      s"phase ${r.getString(0)} failed: $r"))
  }

  test("addToIndex touches only the batch: existing index rows unchanged") {
    val base = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    val batch = NearDup.rotatedTo(base.filter(col("vec_id") % 20 === 0), 0.35)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val cent = Ivf.trainCentroids(base, 16)
    val before = Ivf.assign(base, cent)
    val after = IvfIncremental.addToIndex(before, batch, cent)
    // the update is append-only: rows(after) = rows(before) + rows(batch),
    // and restricting to pre-existing ids reproduces `before` exactly
    assert(after.count() == before.count() + batch.count())
    val beforeIds = after.filter(col("vec_id") < 1000000L)
    assert(beforeIds.except(before).count() == 0 &&
      before.except(beforeIds).count() == 0)
  }

  test("bounded frozen-quantizer query is row-identical to the join pipeline over the materialized index") {
    import graft.dedup.Dedup
    val base = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    val batch = NearDup.rotatedTo(base.filter(col("vec_id") % 20 === 0), 0.35)
      .select((col("vec_id") + Dedup.PlantOffset).as("vec_id"), col("embedding"))
      .localCheckpoint()
    val probes = NearDup.rotatedTo(batch, 0.97)
      .select((col("vec_id") + Dedup.PlantOffset).as("probe_id"),
        col("embedding").as("probe_vec"))
      .localCheckpoint()
    val cent = Ivf.trainCentroids(base, 16)
    val freshIndex = IvfIncremental.addToIndex(Ivf.assign(base, cent), batch, cent)
    val vectors = base.unionByName(batch)
    val viaIndex = Ivf.queryIndex(cent, freshIndex, vectors, probes, k = 1, nProbe = 4)
      .select("probe_id", "neighbor_id", "cosine")
    val viaScan = Ivf.queryIndexBounded(cent, vectors, probes, k = 1, nProbe = 4)
      .select("probe_id", "neighbor_id", "cosine")
    assert(viaScan.except(viaIndex).count() == 0 &&
      viaIndex.except(viaScan).count() == 0,
      "bounded scan diverged from the materialized-index join pipeline")
  }

  test("batch assignment agrees with what a per-vector argmin would give") {
    val base = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    val batch = NearDup.rotatedTo(base.filter(col("vec_id") % 20 === 0), 0.35)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val cent = Ivf.trainCentroids(base, 16)
    // assigning batch-alone vs batch-within-union must agree: the
    // assignment is a pure per-row function of the embedding and the
    // frozen centroids (no corpus dependence) — the property that makes
    // the incremental add correct at all
    val alone = Ivf.assign(batch, cent)
    val together = Ivf.assign(base.unionByName(batch), cent)
      .filter(col("vec_id") >= 1000000L)
    assert(alone.except(together).count() == 0 &&
      together.except(alone).count() == 0)
  }
}
