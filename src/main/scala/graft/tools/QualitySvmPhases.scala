package graft.tools

import org.apache.spark.ml.classification.LinearSVC
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing of `corpus_quality_svm` at bench conditions (round-15,
  * guide §1): featurization/persist vs LinearSVC.fit (OWLQN iterations
  * = collect-driven treeAggregate jobs) vs the held-out transform.
  */
object QualitySvmPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"QSVMPHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val m = classOf[graft.text.QualitySvm.type]
    val _ = m
    for (rnd <- 1 to 2) {
      println(s"QSVMPHASE ---- round $rnd")
      // replicate qualitySvm's internals with timing
      val feat = graft.text.QualitySvm.plantedQualityDocs(spark, sfDir).select(
        col("doc_id"), col("label"),
        pmod(pmod(col("doc_id"), lit(1000000L)), lit(2)).as("fold"),
        graft.text.QualitySvm.featureColsPublic(col("text")).as("features"))
      val train = feat.filter(col("fold") === 0).persist()
      t("train-materialize") { train.count() }
      println(s"QSVMPHASE train_partitions=${train.rdd.getNumPartitions} train_rows=${train.count()}")
      val model0 = t("fit") {
        new LinearSVC().setMaxIter(10).setRegParam(1e-3).setTol(1e-4)
          .fit(train)
      }
      println(s"QSVMPHASE model_iters=${model0.summary.totalIterations} " +
        s"objhist=${model0.summary.objectiveHistory.length} " +
        s"coef_norm=${math.sqrt(model0.coefficients.toArray.map(c => c * c).sum)}")
      val model = model0.copy(org.apache.spark.ml.param.ParamMap.empty)
      t("transform-agg") {
        model.transform(feat.filter(col("fold") === 1))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_eval"),
            sum(when(col("prediction") === col("label"), 1L).otherwise(0L)).as("n_hit"))
          .collect()
      }
      train.unpersist()
      t("full-query") {
        graft.text.QualitySvm.qualitySvm(spark, sfDir).collect()
      }
    }
    spark.stop()
  }
}
