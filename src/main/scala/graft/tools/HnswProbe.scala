package graft.tools

import graft.similarity.{Ann, Hnsw, Ivf}
import org.apache.spark.sql.functions._

/** Tuning probe for the graph ANN tier: prints realized recall@10 and
  * eval budgets for hnsw vs ivf at the shared candidate budget, across
  * parameter settings. Usage: runMain graft.tools.HnswProbe [sfDir].
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
    val data = Ann.clusteredEmbeddings(spark, sfDir).localCheckpoint()
    val corpusN = data.count()
    val probes = Ann.sampleProbes(
      data.filter(col("vec_id") < 1000000L && pmod(col("vec_id"), lit(20)) === 0),
      2000).localCheckpoint()
    val brute = Ann.bruteForceTopKOf(data, probes, k)
      .select("probe_id", "neighbor_id").localCheckpoint()
    val nTruth = brute.count()
    def recallOf(ann: org.apache.spark.sql.DataFrame): Double = {
      val hits = brute.join(ann.select("probe_id", "neighbor_id"),
        Seq("probe_id", "neighbor_id")).count()
      hits.toDouble / nTruth
    }
    println(s"HNSWPROBE corpus=$corpusN probes=${probes.count()} truth=$nTruth")
    val ivfR = recallOf(Ivf.ivfTopKBounded(data, probes, k, nLists = 16, nProbe = 4))
    println(f"HNSWPROBE ivf recall=$ivfR%.4f")
    val shipped = math.max(128, (corpusN / 4 / 4).toInt)
    for (p <- Seq(Hnsw.Params(m = 8, efConstruction = 32, efSearch = 64, shards = 4));
         cap <- Seq(shipped)) {
      val cands = Hnsw.searchShards(data, probes, k, p, cap).localCheckpoint()
      val r = recallOf(Hnsw.topK(cands, k))
      val maxEv = cands.groupBy("probe_id", "shard").agg(max("evals").as("e"))
        .groupBy("probe_id").agg(sum("e").as("tot")).agg(max("tot")).head().getLong(0)
      println(f"HNSWPROBE hnsw m=${p.m} efC=${p.efConstruction} efS=${p.efSearch} cap=$cap recall=$r%.4f maxEvals=$maxEv")
    }
    spark.stop()
  }
}
