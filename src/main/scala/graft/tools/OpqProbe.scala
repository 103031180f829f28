package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.{Ann, Opq, Pq}

/** Diagnostic: raw recall@10 numbers behind the `ann_opq` booleans. */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"OPQPROBE $tag t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
    }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = Opq.concentratedEmbeddings(spark, sfDir)
      .select("vec_id", "embedding").localCheckpoint()
    val probes = corpus
      .filter(pmod(col("vec_id") - Opq.OpqOffset, lit(16L * 13L)) === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      .localCheckpoint()
    println(s"OPQPROBE corpus=${corpus.count()} probes=${probes.count()}")
    lap("build")
    val brute = Ann.bruteForceTopKOf(corpus, probes, 10)
      .select("probe_id", "neighbor_id").localCheckpoint()
    val nTruth = brute.count()
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      brute.join(approx, Seq("probe_id", "neighbor_id")).count().toDouble / nTruth
    lap("brute")
    val plain = recall(Pq.pqTopKOf(corpus, probes, 10).select("probe_id", "neighbor_id"))
    println(f"OPQPROBE plain_pq_recall=$plain%.4f")
    lap("plain_pq")
    val rot = Opq.rotationMatrix(64)
    val rc = Opq.rotated(corpus, rot).localCheckpoint()
    val rp = Opq.rotated(
      probes.select(col("probe_id").as("vec_id"), col("probe_vec").as("embedding")), rot)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      .localCheckpoint()
    lap("rotate")
    val opq = recall(Pq.pqTopKOf(rc, rp, 10).select("probe_id", "neighbor_id"))
    println(f"OPQPROBE opq_recall=$opq%.4f")
    lap("opq_pq")
    spark.stop()
  }
}
