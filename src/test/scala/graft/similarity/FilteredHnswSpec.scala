package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Filtered GRAPH ANN pins (round-13 verdict #4): the beam expands
  * THROUGH predicate-failing nodes but never returns them; the budget
  * is the SAME IVF-equal eval cap as the unfiltered graph row (parity
  * vs the IVF-filtered tier — the filtered beam runs longer within
  * the budget, it does not get a bigger one); and the planted
  * decoy/answer contract separates in-beam filtering from
  * post-filtering structurally.
  */
class FilteredHnswSpec extends SparkSpec {

  private def harness(probeEvery: Int = 50) = {
    val data = FilteredAnn.taggedCorpus(spark, sf001, probeEvery, passCos = 0.97)
      .localCheckpoint()
    val probes = spark.read.parquet(s"$sf001/embeddings.parquet")
      .filter(pmod(col("vec_id"), lit(probeEvery)) === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    (data, probes)
  }

  test("gate row: filtered top-1 is the passing plant, decoy tops the " +
    "unfiltered search, budget respected (the ann_filtered_hnsw oracle)") {
    val row = FilteredAnn.filteredTop1Hnsw(spark, sf001).head()
    assert(row.getString(0) == "hnsw_filtered")
    assert(row.getBoolean(1), "filtered hit rate under the bar — the beam " +
      "is not reaching the passing plants within the IVF-equal budget")
    assert(row.getBoolean(2), "decoy rate under the bar — the unfiltered " +
      "beam should find each probe's exact duplicate")
    assert(row.getBoolean(3), "eval accounting exceeded cap × shards")
  }

  test("no predicate-failing row ever reaches the filtered answer set, " +
    "while the unfiltered answers are decoy-topped — in-beam filtering, " +
    "not post-filtering") {
    val (data, probes) = harness()
    val p = Hnsw.Params()
    val corpusN = data.count()
    val evalCap = math.max(128, (corpusN / 4 / p.shards).toInt)
    val filtered = Hnsw.topK(
      Hnsw.searchShardsFiltered(data, probes, k = 5, p, evalCap), 5)
    // every returned id must be allowed: naturals and PassOffset plants
    // pass, FailOffset decoys never appear
    val failing = filtered.join(data.filter(!col("allowed")),
      filtered("neighbor_id") === data("vec_id")).count()
    assert(failing == 0L,
      "the filtered beam returned a predicate-failing node — results " +
        "must be passing-only even though the beam traverses failures")
    val unfiltered = Hnsw.topK(
      Hnsw.searchShards(data.select("vec_id", "embedding"), probes, k = 1, p,
        evalCap), 1)
    val nProbes = probes.count()
    val decoyTop = unfiltered.filter(
      col("neighbor_id") === col("probe_id") + FilteredAnn.FailOffset).count()
    assert(decoyTop >= 0.9 * nProbes,
      s"unfiltered top-1 should be the exact-dup decoy (got $decoyTop of $nProbes)")
  }

  test("budget parity vs the IVF-filtered tier: the filtered beam's " +
    "per-probe summed evals respect the same corpus/4 candidate budget " +
    "IVF's nProbe/nLists contract scans") {
    val (data, probes) = harness()
    val p = Hnsw.Params()
    val corpusN = data.count()
    val evalCap = math.max(128, (corpusN / 4 / p.shards).toInt)
    val cands = Hnsw.searchShardsFiltered(data, probes, k = 1, p, evalCap)
    val maxTot = cands.groupBy("probe_id", "shard").agg(max("evals").as("e"))
      .groupBy("probe_id").agg(sum("e").as("tot"))
      .agg(max("tot")).head().getLong(0)
    assert(maxTot <= evalCap.toLong * p.shards,
      s"filtered search spent $maxTot evals > cap ${evalCap.toLong * p.shards}" +
        " — filtering must not buy a bigger budget than the IVF tier scans")
    // and the budget is genuinely the IVF scan fraction (not the floor)
    // whenever the corpus is big enough for the contract to bind
    if (corpusN / 4 / p.shards >= 128)
      assert(evalCap.toLong * p.shards <= corpusN / 2,
        "cap formula drifted from the IVF-equal scan fraction")
  }
}
