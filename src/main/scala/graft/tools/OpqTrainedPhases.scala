package graft.tools

import graft.similarity.Opq

/** Phase timing of the `ann_opq_trained` pipeline at bench conditions
  * (local[32], shuffle=32) — which of corpus-build / fixed-distortion /
  * aligned-distortion / sample / parametric-init / alternation /
  * trained-distortion owns the 17 s (round-14 optimization, guide §1).
  */
object OpqTrainedPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"OPQPHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // untimed warmup (the bench's warmSession does the same)
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (round <- 1 to 2) {
      println(s"OPQPHASE ---- round $round")
      val corpus = t("corpus-checkpoint") {
        val c = Opq.blockStructuredEmbeddings(spark, sfDir)
          .select("vec_id", "embedding").localCheckpoint()
        c.count(); c
      }
      val fixedD = t("fixedD") { Opq.distortionOf(corpus, Opq.rotationMatrix(64)) }
      val q = Opq.rotationMatrix(64, seed = 7777L)
      val alignedD = t("alignedD") {
        Opq.distortionOf(corpus, Array.tabulate(64, 64)((i, j) => q(j)(i)))
      }
      val sample = t("sample") { Opq.trainingSample(corpus) }
      val init = t("parametricInit") { Opq.parametricInit(sample) }
      val (trainedR, _) = t("alternation") {
        Opq.trainRotation(sample, opqIters = 8, pqIters = 3, init = Some(init))
      }
      val trainedD = t("trainedD") { Opq.distortionOf(corpus, trainedR) }
      println(f"OPQPHASE dist fixed=$fixedD%.1f aligned=$alignedD%.1f trained=$trainedD%.1f")
    }
    spark.stop()
  }
}
