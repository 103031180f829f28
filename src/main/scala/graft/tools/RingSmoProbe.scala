package graft.tools

import org.apache.spark.sql.SparkSession
import graft.svm._

/** Where does svm_model_io's 2.3 s go: RingData SMO convergence probe. */
object RingSmoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val slice = RingData.rings(spark, n = 200, k = 1, dim = 8, classes = 10)
      .orderBy("id").collect().map(r => LabeledVec(r.label, r.features))
    for (p <- Seq(("rbf", ParallelSvm.rbfParams(8)), ("linear", ParallelSvm.defaultParams(8)))) {
      for (round <- 1 to 2) {
        val t0 = System.nanoTime()
        val m = Smo.train(slice, p._2)
        println(f"RINGSMO kernel=${p._1} round=$round train=${(System.nanoTime() - t0) / 1e9}%6.2fs sv=${m.supportVectors.length}")
      }
    }
    spark.stop()
  }
}
