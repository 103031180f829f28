package graft.tools

import org.apache.spark.sql.SparkSession
import graft.svm._

/** Driver-side SMO timing: how long one subset-solve takes at the
  * sizes the meta-algorithms actually produce. */
object SmoProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .collect().map(r => LabeledVec(r.getInt(2), r.getSeq[Float](1).toArray))
    val params = ParallelSvm.defaultParams(64)
    for (n <- Seq(250, 500, 1000, all.length)) {
      val slice = all.take(n)
      val t0 = System.nanoTime()
      val m = Smo.train(slice, params)
      val t1 = System.nanoTime()
      val errs = slice.count(s => m.predict(s.features) != s.label)
      val t2 = System.nanoTime()
      println(f"SMOPROBE n=$n%5d train=${(t1 - t0) / 1e9}%6.2fs sv=${m.supportVectors.length}%5d " +
        f"predict=${(t2 - t1) / 1e9}%6.2fs errRate=${errs.toDouble / n}%.3f")
    }
    spark.stop()
  }
}
