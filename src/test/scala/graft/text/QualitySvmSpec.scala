package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Trained quality-classifier filter (QualitySvm): plant structure,
  * structural feature gap, and held-out separation.
  */
class QualitySvmSpec extends SparkSpec {

  test("planted junk has a structural digit-ratio gap vs every natural doc") {
    val d = QualitySvm.plantedQualityDocs(spark, sf0001)
      .withColumn("digit_ratio",
        regexp_count(col("text"), lit("[0-9]")).cast("double") /
          greatest(length(col("text")), lit(1)))
    val r = d.agg(
      max(when(col("label") === 0.0, col("digit_ratio"))).as("max_good"),
      min(when(col("label") === 1.0, col("digit_ratio"))).as("min_junk")).head()
    assert(r.getDouble(0) == 0.0, s"natural docs must be digit-free, max=${r.getDouble(0)}")
    assert(r.getDouble(1) >= 0.25, s"junk payload must dominate, min=${r.getDouble(1)}")
  }

  test("held-out per-class accuracy is exact at sf0.001") {
    val rows = QualitySvm.qualitySvm(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("good", "junk"))
    rows.foreach(r => assert(r.getBoolean(2), s"class ${r.getString(0)} misclassified: $r"))
    // n_eval follows from plant arithmetic: naturals with odd id, junk
    // copies of ids ≡ 3 (mod 6)
    val n = spark.read.parquet(s"$sf0001/documents.parquet")
      .agg(sum(when(col("doc_id") % 2 === 1, 1L)).as("g"),
        sum(when(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 1, 1L)).as("j")).head()
    assert(rows(0).getLong(1) == n.getLong(0))
    assert(rows(1).getLong(1) == n.getLong(1))
  }

  test("teeth: a label-blind majority model cannot clear the junk pin") {
    // Scrambled labels (parity of the original id instead of the plant
    // class) destroy the feature-label alignment: the same pipeline
    // must NOT report perfect per-class accuracy — proving acc_ok
    // measures learned separation, not a tautology of the output shape.
    import org.apache.spark.ml.classification.LinearSVC
    import spark.implicits._
    val feat = QualitySvm.plantedQualityDocs(spark, sf0001).select(
      col("doc_id"),
      pmod(pmod(col("doc_id"), lit(QualitySvm.PlantOffset)), lit(2)).cast("double").as("label"),
      org.apache.spark.ml.functions.array_to_vector(array(
        regexp_count(col("text"), lit("[0-9]")).cast("double") /
          greatest(length(col("text")), lit(1)))).as("features"))
    // copy() drops the summary (it holds the SparkSession, which stops
    // serializing once any observe() query ran in the shared session)
    val m = new LinearSVC().setMaxIter(10).setRegParam(1e-3).fit(feat)
      .copy(org.apache.spark.ml.param.ParamMap.empty)
    val acc = m.transform(feat)
      .agg(avg(when(col("prediction") === col("label"), 1.0).otherwise(0.0))).head().getDouble(0)
    assert(acc < 0.9, s"parity labels must not be learnable from digit features, acc=$acc")
  }
}
