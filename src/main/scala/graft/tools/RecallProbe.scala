package graft.tools

import org.apache.spark.sql.functions._

/** Stage-level timing of the recall-contract machinery (diagnostic). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/testdata-sf1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"RECALLPROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val data = t("clustered+ckpt") {
      graft.similarity.Ann.clusteredEmbeddings(spark, sfDir).localCheckpoint()
    }
    val probes = t("probes+ckpt") {
      graft.similarity.Ann.sampleProbes(
        data.filter(col("vec_id") < 1000000L && pmod(col("vec_id"), lit(20)) === 0), 2000)
        .localCheckpoint()
    }
    println(s"RECALLPROBE n_data=${data.count()} n_probes=${probes.count()}")
    val brute = t("brute+ckpt") {
      graft.similarity.Ann.bruteForceTopKOf(data, probes, 10)
        .select("probe_id", "neighbor_id").localCheckpoint()
    }
    println(s"RECALLPROBE n_truth=${brute.count()}")
    t("train_centroids") { graft.similarity.Ivf.trainCentroids(data, 16, 3).collect() }
    t("train_codebooks") { graft.similarity.Pq.trainCodebooks(data, 8, 16, 3) }
    t("lsh_topk") {
      graft.similarity.Ann.lshTopKOf(data, probes, 10, nTables = 8, planesPerTable = 6)
        .select("probe_id", "neighbor_id").localCheckpoint()
    }
    t("ivf_topk") {
      graft.similarity.Ivf.ivfTopKOf(data, probes, 10, nLists = 16, nProbe = 4)
        .select("probe_id", "neighbor_id").localCheckpoint()
    }
    val pq = t("pq_topk(ivf-bounded)") {
      graft.similarity.Pq.pqTopKOf(data, probes, 10).select("probe_id", "neighbor_id")
        .localCheckpoint()
    }
    val hits = t("join+count") {
      brute.join(pq, Seq("probe_id", "neighbor_id")).count()
    }
    println(s"RECALLPROBE hits=$hits")
    spark.stop()
  }
}
