package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the REALIZED recall@k of both ANN indexes over the clustered
  * corpus at each sf — the measurement behind ann_recall_atk's pins.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val k = 10
    for (dir <- dirs) {
      val data = graft.similarity.Ann.clusteredEmbeddings(spark, dir).localCheckpoint()
      val probes = data
        .filter(col("vec_id") < 1000000L && pmod(col("vec_id"), lit(20)) === 0)
        .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
        .localCheckpoint()
      val brute = graft.similarity.Ann.bruteForceTopKOf(data, probes, k)
        .select("probe_id", "neighbor_id").localCheckpoint()
      val nTruth = brute.count()
      def recallOf(ann: org.apache.spark.sql.DataFrame): Double = {
        val hits = brute.join(ann.select("probe_id", "neighbor_id"),
          Seq("probe_id", "neighbor_id")).count()
        hits.toDouble / nTruth
      }
      val lsh = recallOf(graft.similarity.Ann.lshTopKOf(data, probes, k, 8, 6))
      val ivf = recallOf(graft.similarity.Ivf.ivfTopKOf(data, probes, k, 16, 4))
      println(f"RECALL $dir nTruth=$nTruth lsh=$lsh%.4f ivf=$ivf%.4f")
    }
    spark.stop()
  }
}
