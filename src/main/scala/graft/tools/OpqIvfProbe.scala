package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.{Ann, Opq, Pq}

/** Measures recall@10 of plain vs rotated IVF-PQ on the concentrated
  * corpus — the measurement behind ann_opq_ivf's pins.
  */
object OpqIvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    val corpus = Opq.concentratedEmbeddings(spark, sfDir)
      .select("vec_id", "embedding").localCheckpoint()
    val probes = corpus
      .filter(pmod(col("vec_id") - Opq.OpqOffset, lit(16L * 13L)) === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      .localCheckpoint()
    val brute = Ann.bruteForceTopKOf(corpus, probes, 10)
      .select("probe_id", "neighbor_id").localCheckpoint()
    val nTruth = brute.count()
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      brute.join(approx, Seq("probe_id", "neighbor_id")).count().toDouble / nTruth
    val plain = recall(Pq.ivfPqTopKOf(corpus, probes, 10).select("probe_id", "neighbor_id"))
    println(f"OPQIVF plain_ivfpq_recall=$plain%.4f")
    val rot = Opq.rotationMatrix(64)
    val rc = Opq.rotated(corpus, rot).localCheckpoint()
    val rp = Opq.rotated(
      probes.select(col("probe_id").as("vec_id"), col("probe_vec").as("embedding")), rot)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      .localCheckpoint()
    val opq = recall(Pq.ivfPqTopKOf(rc, rp, 10).select("probe_id", "neighbor_id"))
    println(f"OPQIVF opq_ivfpq_recall=$opq%.4f")
    spark.stop()
  }
}
