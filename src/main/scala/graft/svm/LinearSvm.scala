package graft.svm

import org.apache.spark.ml.classification.{LinearSVC, OneVsRest}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.DenseVector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed linear SVM — the Spark-native answer to "train one big
  * SVM on all the data" that the reference decomposes because a single
  * LibSVM solve cannot scale (README.md:2). On Spark, hinge-loss linear
  * SVM trains distributed natively (MLlib LinearSVC, OWLQN), so this is
  * the engine's scale path for linear kernels: no per-partition
  * decomposition needed, data never leaves the executors, and the
  * model is O(dim) instead of O(n_sv * dim).
  *
  * Multi-class: one-vs-rest over the hinge-loss binary learner.
  */
object LinearSvm {

  /** Train OVR linear SVM on (id, label, features array<float>) and
    * return one row per class: (class_label, coef_norm, intercept,
    * n_nonzero) plus a final accuracy row (class_label = -1).
    */
  def trainSummary(spark: SparkSession, sfDir: String, maxIter: Int = 10, regParam: Double = 0.01): DataFrame = {
    import spark.implicits._
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(
        col("label").cast("double").as("label"),
        array_to_vector(col("embedding")).as("features"))
      .cache()

    val svc = new LinearSVC().setMaxIter(maxIter).setRegParam(regParam).setTol(1e-4)
    // The 10 one-vs-rest binary problems are independent; train them
    // concurrently (each solve is itself distributed, so this multiplies
    // cluster utilization instead of queueing 10 sequential OWLQN runs).
    val ovr = new OneVsRest().setClassifier(svc).setParallelism(10)
    val model = ovr.fit(df)

    val perClass = model.models.zipWithIndex.map { case (m, i) =>
      val lsvc = m.asInstanceOf[org.apache.spark.ml.classification.LinearSVCModel]
      // toArray, not a DenseVector cast: with regularization a class's
      // coefficient vector can come back sparse.
      val coefs = lsvc.coefficients.toArray
      val norm = math.sqrt(coefs.map(c => c * c).sum)
      (i, norm, lsvc.intercept, coefs.count(_ != 0.0).toLong)
    }

    // one aggregation pass: scoring every row against 10 binary models
    // is the expensive stage — don't pay it twice with filter+count.
    val accRow = model.transform(df)
      .agg(count(lit(1)).as("n"),
        sum(when($"label" === $"prediction", 1L).otherwise(0L)).as("hits"))
      .collect()(0)
    val acc = accRow.getLong(1).toDouble / math.max(accRow.getLong(0), 1L)
    df.unpersist()

    (perClass.map { case (l, n, b, nz) => (l, n, b, nz) } :+ ((-1, acc, 0.0, 0L)))
      .toSeq.toDF("class_label", "coef_norm", "intercept", "n_nonzero")
      .withColumn("coef_norm", round(col("coef_norm"), 6))
      .withColumn("intercept", round(col("intercept"), 6))
  }
}
