package graft.tools

import org.apache.spark.sql.functions._
import graft.similarity.{Ann, Opq, Pq}

/** Diagnostic: recall of plain / fixed-rotation / trained-OPQ PQ on the
  * block-structured corpus (the one a data-blind rotation can't fix).
  */
object TrainedOpqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"OPQPROBE $name took ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val corpus = Opq.blockStructuredEmbeddings(spark, sfDir).localCheckpoint()
    val probes = corpus
      .filter(pmod(col("vec_id") - Opq.BlockOffset, lit(13L)) === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      .localCheckpoint()
    println(s"OPQPROBE n=${corpus.count()} probes=${probes.count()}")
    val brute = Ann.bruteForceTopKOf(corpus, probes, 10)
      .select("probe_id", "neighbor_id").localCheckpoint()
    val nTruth = brute.count()
    def recall(ann: org.apache.spark.sql.DataFrame): Double =
      brute.join(ann.select("probe_id", "neighbor_id"),
        Seq("probe_id", "neighbor_id")).count().toDouble / nTruth
    def rotate(r: Array[Array[Double]]) = (
      Opq.rotated(corpus, r).localCheckpoint(),
      Opq.rotated(probes.select(col("probe_id").as("vec_id"),
        col("probe_vec").as("embedding")), r)
        .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
        .localCheckpoint())
    val eye = Array.tabulate(64, 64)((i, j) => if (i == j) 1.0 else 0.0)
    val plain = t("plain") { recall(Pq.pqTopKFlat(corpus, probes, 10)) }
    println(f"OPQPROBE plain_recall=$plain%.3f dist=${Opq.distortionOf(corpus, eye)}%.1f")
    val fixedR = Opq.rotationMatrix(64)
    val (fc, fp) = rotate(fixedR)
    val fixed = t("fixed") { recall(Pq.pqTopKFlat(fc, fp, 10)) }
    println(f"OPQPROBE fixed_recall=$fixed%.3f dist=${Opq.distortionOf(corpus, fixedR)}%.1f")
    val (trainedR, tdist) = t("train") { Opq.trainRotation(corpus, opqIters = 24, pqIters = 3) }
    val (tc, tp) = rotate(trainedR)
    val trained = t("trained") { recall(Pq.pqTopKFlat(tc, tp, 10)) }
    println(f"OPQPROBE trained_recall=$trained%.3f dist=$tdist%.1f")
    val pcaR = t("pca_init") { Opq.parametricInit(corpus) }
    println(f"OPQPROBE pca_init_dist=${Opq.distortionOf(corpus, pcaR)}%.1f")
    val (ptR, ptDist) = t("train_pca") {
      Opq.trainRotation(corpus, opqIters = 8, pqIters = 3, init = Some(pcaR))
    }
    val (pc, pp) = rotate(ptR)
    val ptRecall = recall(Pq.pqTopKFlat(pc, pp, 10))
    println(f"OPQPROBE pca_trained_recall=$ptRecall%.3f dist=$ptDist%.1f")
    // aligned-optimum reference: the inverse of the generative mixing Q
    val q = Opq.rotationMatrix(64, seed = 7777L)
    val qInv = Array.tabulate(64, 64)((i, j) => q(j)(i))
    println(f"OPQPROBE aligned_dist=${Opq.distortionOf(corpus, qInv)}%.1f")
    spark.stop()
  }
}
