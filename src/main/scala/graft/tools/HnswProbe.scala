package graft.tools

import graft.similarity.{Ann, Hnsw, Ivf}
import org.apache.spark.sql.functions._

/** Tuning probe for the graph ANN tier: prints realized recall@10 and
  * eval budgets for hnsw vs ivf at the shared candidate budget, across
  * parameter settings. Usage:
  * runMain graft.tools.HnswProbe [sfDir] [shards,shards,...]
  * (shards list defaults to "4"; "1,2" is the big-shard evidence run —
  * the whole corpus in 1-2 graphs, probing whether the single-layer
  * NSW argument holds as shard size grows.)
  */
object HnswProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val k = 10
    // the SAME scaffold the shipped contracts use (Ann.recallHarness) —
    // a drifting probe rule here would tune against a different metric
    val h = Ann.recallHarness(spark, sfDir, k)
    val corpusN = h.data.count()
    println(s"HNSWPROBE corpus=$corpusN probes=${h.nProbes} truth=${h.nTruth}")
    val ivfR = h.recallOf(Ivf.ivfTopKBounded(h.data, h.probes, k, nLists = 16, nProbe = 4))
    println(f"HNSWPROBE ivf recall=$ivfR%.4f")
    val shardsList = args.drop(1).headOption.map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(4))
    for (sh <- shardsList) {
      val p = Hnsw.Params(m = 8, efConstruction = 32, efSearch = 64, shards = sh)
      // the shipped budget rule: IVF's per-probe scan (corpus/4) split
      // evenly across the graph's shards, 128-eval floor
      val cap = math.max(128, (corpusN / 4 / sh).toInt)
      val t0 = System.nanoTime()
      val cands = Hnsw.searchShards(h.data, h.probes, k, p, cap).localCheckpoint()
      val r = h.recallOf(Hnsw.topK(cands, k))
      val secs = (System.nanoTime() - t0) / 1e9
      val maxEv = cands.groupBy("probe_id", "shard").agg(max("evals").as("e"))
        .groupBy("probe_id").agg(sum("e").as("tot")).agg(max("tot")).head().getLong(0)
      println(f"HNSWPROBE hnsw shards=$sh rowsPerShard=${corpusN / sh} m=${p.m} efC=${p.efConstruction} efS=${p.efSearch} cap=$cap recall=$r%.4f maxEvals=$maxEv t=$secs%.1fs")
    }
    spark.stop()
  }
}
