package graft.tools

import graft.similarity.Opq

/** Diagnostic for the round-13 sampled OPQ training: distortions of
  * fixed / aligned / sampled-trained / full-trained rotations on the
  * block-structured corpus, so the contrast thresholds can be pinned
  * from MEASUREMENT per SF.
  */
object SampleOpqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = Opq.blockStructuredEmbeddings(spark, sfDir)
      .select("vec_id", "embedding").localCheckpoint()
    println(s"SAMPLEOPQ n=${corpus.count()}")
    val fixedD = Opq.distortionOf(corpus, Opq.rotationMatrix(64))
    val q = Opq.rotationMatrix(64, seed = 7777L)
    val alignedD = Opq.distortionOf(corpus, Array.tabulate(64, 64)((i, j) => q(j)(i)))
    def timeIt[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SAMPLEOPQ $tag took ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    println(f"SAMPLEOPQ fixed=$fixedD%.2f aligned=$alignedD%.2f " +
      f"fixed/aligned=${fixedD / alignedD}%.3f")
    for (maxRows <- Seq(2048L, 4096L, 8192L)) {
      val sample = Opq.trainingSample(corpus, maxRows)
      val n = sample.count()
      val (sampledR, _) = timeIt(s"train-sampled-$maxRows") {
        Opq.trainRotation(sample, opqIters = 8, pqIters = 3,
          init = Some(Opq.parametricInit(sample)))
      }
      val sampledD = Opq.distortionOf(corpus, sampledR)
      println(f"SAMPLEOPQ maxRows=$maxRows n=$n sampled=$sampledD%.2f " +
        f"sampled/fixed=${sampledD / fixedD}%.3f " +
        f"sampled/aligned=${sampledD / alignedD}%.3f")
    }
    spark.stop()
  }
}
