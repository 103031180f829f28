package graft.text

import org.apache.spark.ml.classification.LinearSVC
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained quality classifier over the document corpus — the
  * classifier-filter stage every large pretraining pipeline runs
  * (the public recipe: weak labels from heuristics or a trusted/junk
  * contrast set, a cheap linear model over shallow text features,
  * score-and-filter the whole corpus; cf. CCNet and the GPT-3/WebText
  * quality filter). The engine trains its OWN filter with its OWN
  * distributed SVM surface (MLlib LinearSVC — the same hinge-loss
  * scale path as `svm_linear_train`), tying the reference's SVM
  * capability to the corpus pipeline.
  *
  * Plant discipline: the corpus has no junk, so junk is PLANTED — a
  * copy of every `JunkEvery`-th document with a digit payload sized
  * proportionally to the document (≈ 1/20th of its length in
  * " 0123456789" blocks, so digit_ratio lands ≥ ~0.3 for every
  * language, Chinese included, while every natural document in the
  * corpus has digit_ratio exactly 0). The feature gap is structural,
  * the train/eval split is by ORIGINAL doc id parity (held-out docs
  * never seen in training in either class), and the contract pins
  * per-class held-out accuracy — n_eval is computable by the SQL
  * oracle from the plant arithmetic alone.
  *
  * Scale: featurization is one codegen scan (regexp_count ratios —
  * the text_quality signals); LinearSVC is linear-time per OWLQN pass
  * with O(dim)=4 model state; scoring is one more scan. Nothing
  * quadratic, nothing driver-bound beyond the 4-float model.
  */
object QualitySvm {

  val JunkEvery = 3
  val PlantOffset = 1000000L

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Digit payload ≈ len/20 repetitions of " 0123456789" (11 chars,
    * 10 digits): appended digit mass ≈ 0.5·len, so digit_ratio ≈
    * 0.5/1.55 ≈ 0.32 with a hard floor well above 0 at any length —
    * against natural docs at exactly 0, a structural margin.
    */
  private def junkPayload(len: Column): Column =
    repeat(lit(" 0123456789"), ceil(len.cast("double") / 20.0).cast("int"))

  /** Natural docs labeled good (0.0) + planted junk copies of every
    * `JunkEvery`-th doc labeled 1.0, ids offset by PlantOffset.
    */
  def plantedQualityDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    d.select(col("doc_id"), col("text"), lit(0.0).as("label"))
      .unionByName(d.filter(pmod(col("doc_id"), lit(JunkEvery)) === 0)
        .select((col("doc_id") + PlantOffset).as("doc_id"),
          concat(col("text"), junkPayload(length(col("text")))).as("text"),
          lit(1.0).as("label")))
  }

  /** The four text_quality ratio signals as an ML feature vector —
    * all codegen regexp_count arithmetic, one scan.
    */
  private def featureCols(text: Column): Column = featureColsPublic(text)

  private[graft] def featureColsPublic(text: Column): Column = array_to_vector(array(
    regexp_count(text, lit(TextOps.PunctClass)).cast("double") /
      greatest(length(text), lit(1)),
    regexp_count(text, lit("[0-9]")).cast("double") /
      greatest(length(text), lit(1)),
    regexp_count(text, lit("[A-Z]")).cast("double") /
      greatest(length(text), lit(1)),
    TextOps.tokenSetCount(text,
      Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "on")).cast("double") /
      greatest(TextOps.wsTokenCount(text), lit(1))))

  /** `corpus_quality_svm` — train on even original-ids (both classes),
    * evaluate on the held-out odd original-ids, report per-class
    * (quality_class, n_eval, acc_ok). The junk/good feature gap is
    * structural (digit_ratio 0 vs ≥ ~0.3), so held-out accuracy pins
    * at 1.0 exactly; n_eval counts follow from the plant arithmetic
    * and are verified by the SQL oracle.
    */
  def qualitySvm(spark: SparkSession, sfDir: String,
                 maxIter: Int = 5, regParam: Double = 1e-3): DataFrame = {
    import spark.implicits._
    val feat = plantedQualityDocs(spark, sfDir).select(
      col("doc_id"), col("label"),
      pmod(pmod(col("doc_id"), lit(PlantOffset)), lit(2)).as("fold"),
      featureCols(col("text")).as("features"))
    val train = feat.filter(col("fold") === 0).persist()
    try {
      // copy() drops the training summary: LinearSVCSummaryImpl holds
      // the SparkSession, and serializing the model into the scoring
      // tasks would drag session → ObservationManager (non-serializable
      // once any observe() query has run in the session, e.g.
      // q_hierarchy's convergence census) into the task closure.
      // tol 1e-4 / 5 iters (round-15, from 10; round-14 came from 20 @
      // 1e-6): the digit_ratio gap is structural (0 exactly vs ≥ ~0.3),
      // so the separator is fixed within the first OWLQN steps — the
      // probed objective history is flat after iteration ~4 and the
      // held-out contract is identical at 5 and 10 iterations on every
      // SF (QualitySvmPhases; oracle re-verified at sf0.001/0.01/0.1).
      // Each pruned iteration is 2-3 full training-set passes — fixed
      // scheduling cost at sf0.1 and real corpus scans at 100 TB alike.
      // The eval-fold featurization is independent of training, so it
      // materializes as a concurrent job while OWLQN iterates (§2.6).
      val (model, evalFeat) = graft.util.Par.par2(
        new LinearSVC()
          .setMaxIter(maxIter).setRegParam(regParam).setTol(1e-4)
          .fit(train)
          .copy(org.apache.spark.ml.param.ParamMap.empty),
        feat.filter(col("fold") === 1).localCheckpoint())
      val byClass = model.transform(evalFeat)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_eval"),
          sum(when(col("prediction") === col("label"), 1L).otherwise(0L)).as("n_hit"))
        .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
      def row(name: String, label: Double): (String, Long, Boolean) = {
        val (n, hit) = byClass.getOrElse(label, (0L, 0L))
        (name, n, n > 0 && hit == n)
      }
      Seq(row("good", 0.0), row("junk", 1.0))
        .toDF("quality_class", "n_eval", "acc_ok").orderBy("quality_class")
    } finally { train.unpersist(); () }
  }
}
