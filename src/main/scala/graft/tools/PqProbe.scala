package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Measure realized PQ recall@k on the clustered corpus at several
  * settings — evidence for the ann_pq pin. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val data = graft.similarity.Ann.clusteredEmbeddings(spark, sfDir).localCheckpoint()
    val probes = data
      .filter(col("vec_id") < 1000000L && pmod(col("vec_id"), lit(20)) === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      .localCheckpoint()
    val k = 10
    val brute = graft.similarity.Ann.bruteForceTopKOf(data, probes, k)
      .select("probe_id", "neighbor_id").localCheckpoint()
    val nTruth = brute.count()
    for ((m, ksub, rerank) <- Seq((8, 16, 50), (8, 16, 25), (4, 16, 50), (8, 32, 50), (8, 16, 15))) {
      val t0 = System.nanoTime()
      val hits = brute.join(
        graft.similarity.Pq.pqTopKOf(data, probes, k, m, ksub, rerank = rerank)
          .select("probe_id", "neighbor_id"),
        Seq("probe_id", "neighbor_id")).count()
      println(f"PQPROBE m=$m ksub=$ksub rerank=$rerank recall=${hits.toDouble / nTruth}%.4f t=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
