package graft.svm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** DataFrame-shaped query surface for the SVM capability inventory
  * (SURVEY.md §2a). Each method is one `SparkEntry.queries` entry.
  *
  * The deterministic scoring queries (`predictFixed`, `centroidEvaluate`,
  * `kernelGram`) are pure `functions._` pipelines — fully codegen'd,
  * verifiable by an external SQL oracle, and the shape a 100 TB scoring
  * pass would take (single scan, broadcast model constants, no UDF).
  */
object SvmQueries {

  /** Subset count used by the partitioned training queries (power of 2,
    * reference uses 2^k subsets — cascade_svm/Driver.java:37-60).
    */
  val K = 8

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  // ------------------------------------------------------------ 1: stats

  /** Precascade1 re-expressed (reference: cascade_svm/Precascade1.java:20-31
    * counts total records and per-class records in one MapReduce pass):
    * a single rollup aggregation — per-class counts plus the grand total
    * (label = null row), one shuffle, map-side combined.
    */
  def partStats(spark: SparkSession, sfDir: String): DataFrame =
    emb(spark, sfDir)
      .rollup("label")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label").asc_nulls_first)

  // -------------------------------------------------------- 2: partition

  /** Precascade2 re-expressed (reference: cascade_svm/Precascade2.java:18-45
    * randomly assigns records to 2^k subsets capped at ceil(total/k)):
    * deterministic `pmod(vec_id, k)` assignment — balanced for dense ids,
    * no global counter, reproducible by the oracle. Returns the
    * per-(subset, class) histogram that certifies balance.
    */
  def partition(spark: SparkSession, sfDir: String): DataFrame =
    emb(spark, sfDir)
      .groupBy(pmod(col("vec_id"), lit(K)).cast("int").as("subset"), col("label"))
      .agg(count(lit(1)).as("n"))
      .orderBy("subset", "label")

  // ---------------------------------------------------------- 7: predict

  /** Deterministic per-class hyperplane weights: integer arithmetic only,
    * so any external engine reproduces them bit-for-bit.
    */
  def fixedWeights(c: Int, dim: Int = 64): Array[Long] =
    Array.tabulate(dim)(i => ((c * dim.toLong + i) * 2654435761L) % 1000L - 500L)

  /** Score every embedding against 10 fixed hyperplanes and count
    * predictions per class (argmax, ties to the smaller class id) — the
    * linear-model scoring pass: one scan, model broadcast as literals,
    * whole-stage codegen end-to-end.
    *
    * The dot product is unrolled to 64 literal multiply-adds per class
    * instead of `aggregate(zip_with(...))`: higher-order functions are
    * CodegenFallback (interpreted, boxing every element), while getItem
    * with literal weights stays inside whole-stage codegen — the shape
    * a 100 TB scoring pass needs.
    */
  def predictFixed(spark: SparkSession, sfDir: String): DataFrame = {
    val classes = 0 until 10
    val scores = classes.map { c =>
      val w = fixedWeights(c)
      w.indices.map(i => col("embedding").getItem(i).cast("double") * lit(w(i).toDouble))
        .reduce(_ + _)
    }
    // argmax via array_position(scores, max): first occurrence wins, so
    // ties resolve to the smaller class id. Two narrow projects — the
    // scores array is materialized once; a greatest + CASE-chain over 10
    // named score columns would re-inline each 64-term tree ~4×.
    emb(spark, sfDir)
      .select(col("vec_id"), array(scores: _*).as("scores"))
      .select(col("vec_id"),
        (array_position(col("scores"), array_max(col("scores"))) - 1).cast("int").as("pred"))
      .groupBy("pred")
      .agg(count(lit(1)).as("n"))
      .orderBy("pred")
  }

  // --------------------------------------------------------- 8: evaluate

  /** Confusion matrix of a nearest-centroid classifier (the reference's
    * EvaluateDataset role — per-class error accounting,
    * Iterative_svm/Itergsv.java:95-108): centroids via one
    * partial-aggregated explode pass (10×64 doubles — driver-local
    * bytes), then the argmin over classes as a LITERAL-CENTROID codegen
    * expression ([[graft.similarity.Ivf.nearestIdExpr]]) inside a single
    * scan + one map-side-combined groupBy. The earlier
    * crossJoin(broadcast) + row_number formulation blew the corpus up
    * 10× and full-sort-shuffled it just to pick a per-row argmin; this
    * shape is one narrow codegen pass at any corpus size.
    */
  def centroidEvaluate(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val ex = e.select(col("vec_id"), col("label"),
      posexplode(col("embedding")).as(Seq("i", "x")))
    val cent = ex.groupBy(col("label").as("clabel"), col("i"))
      .agg(avg(col("x").cast("double")).as("c"))
      .groupBy("clabel")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
        s => s.getField("c")).as("cvec"))
    // 10 centroid rows to the driver (tie rule: smallest class id —
    // identical to the old orderBy(dist, clabel) window).
    val cents = cent.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    e.select(col("label"),
        graft.similarity.Ivf.nearestIdExpr(cents, col("embedding")).as("pred"))
      .groupBy("label", "pred")
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "pred")
  }

  // ------------------------------------------------------ 10: kernel gram

  /** RBF + linear kernel values for the deterministic pair sample
    * (vec_id, vec_id + 1) — the kernel computation LibSVM evaluates
    * inside every solver iteration, surfaced as a verifiable query.
    */
  def kernelGram(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.join(b, col("id_b") === col("id_a") + 1)
      .select(col("id_a"), col("id_b"),
        round(VectorOps.rbf(col("ea"), col("eb"), 1.0 / 64), 6).as("k_rbf"),
        round(VectorOps.dot(col("ea"), col("eb")), 6).as("k_dot"))
      .orderBy("id_a")
  }

  // -------------------------------------------------------- 9: model IO

  /** LibSVM-format serialize→parse round trip on a model trained from a
    * small deterministic slice; emits model statistics plus a prediction
    * agreement check between the original and re-parsed model.
    *
    * The slice is [[RingData]] (10 classes, sf-INDEPENDENT — the same
    * 200 rows regardless of `sfDir`), so the stats are one fixed vector
    * of numbers and the external oracle can pin them literally: the pin
    * verifies serializer stability and bit-determinism of the SMO solve
    * across JVMs at any scale factor.
    */
  def modelIo(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val slice = RingData.rings(spark, n = 200, k = 1, dim = 8, classes = 10)
      .orderBy("id")
      .collect()
      .map(r => LabeledVec(r.label, r.features))
    val model = Smo.train(slice, ParallelSvm.rbfParams(dim = 8))
    val text = ModelIO.serialize(model)
    val parsed = ModelIO.parse(text)
    val agree = slice.count(s => model.predict(s.features) == parsed.predict(s.features))
    Seq(
      ("model_chars", text.length.toDouble),
      ("n_binaries", model.binaries.length.toDouble),
      ("nr_class", model.labels.length.toDouble),
      ("pred_agree", agree.toDouble / slice.length),
      ("roundtrip_sv", parsed.supportVectors.length.toDouble),
      ("total_sv", model.supportVectors.length.toDouble)
    ).toDF("stat", "value").orderBy("stat")
  }

  // --------------------------------------------------- 3-6: training runs

  def linearTrain(spark: SparkSession, sfDir: String): DataFrame =
    LinearSvm.trainSummary(spark, sfDir)

  /** Scaling note (measured, sf1 = 10× sf0.1): on the noisy embeddings
    * the SV fraction is ~100% (every layer's outputs equal its inputs —
    * see the layer stats), so the cascade's final solve is O(n²) for
    * ANY fan-out k; re-partitioning with a data-sized k was measured
    * SLOWER (228 s vs 154 s at sf1) because a deeper merge tree just
    * re-solves the same dense mass more times. Cascade's scalability
    * premise is SPARSE support (cf. the RBF rings, where SVs ≈ 30%);
    * for dense-SV linear problems the engine's scale path is
    * [[LinearSvm]] (`svm_linear_train`, linear-time per epoch), which
    * is why both ship. The embeddings corpus IS that dense regime, so
    * this query would trip [[ParallelSvm.cascade]]'s dense-SV guard; it
    * opts out explicitly (`maxSvFraction = 1.0`) because reproducing the
    * reference's cascade trace on the canonical table is the point here —
    * a production caller gets the guard by default.
    */
  def cascadeTrain(spark: SparkSession, sfDir: String): DataFrame = {
    val data = ParallelSvm.loadTraining(spark, sfDir, K)
    // The reference's output contract is the SAVED final model
    // (Lastcascade.java:136 saveModelToHdfs) — persist it like the
    // reference does; local temp stands in for the cluster-shared FS.
    val dir = java.nio.file.Files.createTempDirectory("graft-cascade-").toString
    try {
      val (stats, _) = ParallelSvm.cascade(data, K, ParallelSvm.defaultParams(64),
        modelPath = Some(s"$dir/final.model"), maxSvFraction = 1.0)
      ParallelSvm.statsDf(spark, stats)
    } finally graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  def baggingTrain(spark: SparkSession, sfDir: String): DataFrame = {
    val data = ParallelSvm.loadTraining(spark, sfDir, K)
    // Local temp stands in for the cluster-shared FS (hdfs://, s3a://)
    // the reference writes its model-<taskId>.model files to. A fresh
    // per-run directory: a fixed path would let two concurrent
    // bench/verify JVMs truncate each other's model files mid-read.
    val modelDir = java.nio.file.Files.createTempDirectory("graft-bagging-").toString
    try {
      val (stats, _) = ParallelSvm.bagging(data, K, ParallelSvm.defaultParams(64), modelDir)
      ParallelSvm.statsDf(spark, stats)
    } finally graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(modelDir))
  }

  def iterativeTrain(spark: SparkSession, sfDir: String): DataFrame = {
    val data = ParallelSvm.loadTraining(spark, sfDir, K)
    val stats = ParallelSvm.iterative(data, K, ParallelSvm.defaultParams(64))
    ParallelSvm.statsDf(spark, stats)
  }

  /** Cascade with the OPT-IN dense-regime fallback (`svm_cascade_auto`)
    * — the operational behavior a production job wants at 3 a.m.: run
    * the cascade under the DEFAULT dense-SV guard; if layer 1 trips it
    * (the noisy embeddings corpus does), route to the engine's
    * linear-time scale path (MLlib LinearSVC, [[LinearSvm.trainSummary]])
    * instead of dying, and RECORD the switch in the returned trace:
    * the already-paid layer-1 SV census, one loud `dense_fallback`
    * marker row (n_in/n_sv = the tripping census, metric = the SV
    * fraction), then the linear summary mapped into the same schema
    * (stage="linear", subset = class, n_sv = non-zero coefficients,
    * metric = coef norm; the class −1 row carries train accuracy).
    * Only [[DenseSvRegime]] reroutes — every other failure propagates —
    * and `svm_cascade_train`'s fail-loud default is untouched.
    */
  def cascadeAutoTrain(spark: SparkSession, sfDir: String): DataFrame = {
    val data = ParallelSvm.loadTraining(spark, sfDir, K)
    try {
      val (stats, _) = ParallelSvm.cascade(data, K, ParallelSvm.defaultParams(64))
      ParallelSvm.statsDf(spark, stats)
    } catch {
      case d: DenseSvRegime =>
        org.apache.logging.log4j.LogManager.getLogger(getClass).warn(
          s"cascadeAutoTrain: dense-SV regime (${d.nSv}/${d.nIn} layer-1 SVs) — " +
            "routing to the linear-time path (svm_linear_train shape)")
        val marker = LayerStat("dense_fallback", 1, -1, d.nIn, d.nSv,
          d.nSv.toDouble / d.nIn)
        ParallelSvm.statsDf(spark, d.layer1 :+ marker).unionByName(
          LinearSvm.trainSummary(spark, sfDir).select(
            lit("linear").as("stage"), lit(2).as("layer"),
            col("class_label").as("subset"), lit(-1L).as("n_in"),
            col("n_nonzero").as("n_sv"),
            round(col("coef_norm"), 6).as("metric")))
    }
  }

  /** The reference's EXACT LibSVM configuration — RBF, gamma = 1/dim,
    * C=1, eps=1e-3 (cascade_svm/Midcascade.java:62-94) — run end-to-end
    * through the cascade on the concentric-ring slice, where that kernel
    * is non-degenerate and a linear kernel cannot beat the class prior
    * (see [[RingData]]). `sfDir` is unused by design: the slice exists
    * precisely because the embeddings table degenerates under RBF.
    */
  def cascadeTrainRbf(spark: SparkSession, sfDir: String): DataFrame = {
    val data = RingData.rings(spark, n = 2000, k = 4, dim = 8)
    val (stats, _) = ParallelSvm.cascade(data, 4, ParallelSvm.rbfParams(8))
    ParallelSvm.statsDf(spark, stats)
  }

  /** `svm_holdout_eval` (round-11 verdict #7): the evaluation row the
    * reference never ran — it scores its meta-algorithms on their own
    * TRAINING set (cascade_svm/Lastcascade.java evaluates the merged
    * SVs it just trained on); a real user wants the held-out number
    * next to it. Discipline = `corpus_quality_svm`'s id-parity split:
    * train cascade AND bagging on the even-vec_id half (subsets
    * re-keyed `(id/2) mod K` so all K subsets stay populated — a bare
    * `id mod K` over even ids would leave half the subsets empty),
    * then report per-class (n, n_hit, acc) on BOTH splits side by
    * side. Predictions are distributed (broadcast model / ensemble
    * majority vote with bagging's own smaller-label tie-break); the
    * id-sorted SMO makes every number a pure function of the corpus,
    * so the oracle is a literal VALUES pin per corpus (the
    * svm_cascade_train trace-pin machinery, gen_trace_oracle keys).
    */
  def holdoutEval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val all = ParallelSvm.loadTraining(spark, sfDir, K)
    val train = all.filter((ex: Ex) => ex.id % 2 == 0)
      .map(ex => ex.copy(subset = ((ex.id / 2) % K).toInt))
    val holdout = all.filter((ex: Ex) => ex.id % 2 == 1)
    val modelDir = java.nio.file.Files.createTempDirectory("graft-holdout-").toString
    try {
      // maxSvFraction = 1.0: the embeddings corpus IS the dense regime
      // (see cascadeTrain's scaling note) — the point here is the
      // held-out contrast, on the same meta-algorithms as the traces.
      val (_, cascadeModel) = ParallelSvm.cascade(
        train, K, ParallelSvm.defaultParams(64), maxSvFraction = 1.0)
      val (_, bagModels) = ParallelSvm.bagging(
        train, K, ParallelSvm.defaultParams(64), modelDir)
      val sc = spark.sparkContext
      val bcCascade = sc.broadcast(cascadeModel)
      val bcBag = sc.broadcast(bagModels)
      def score(algo: String, split: String,
                data: org.apache.spark.sql.Dataset[Ex]): DataFrame =
        data.mapPartitions { it =>
          val predict: Array[Float] => Int =
            if (algo == "cascade") bcCascade.value.predict _
            else { features =>
              // bagging majority vote, smaller label wins ties — the
              // same rule the ensemble-accuracy pass inside bagging uses
              val votes = scala.collection.mutable.Map.empty[Int, Int]
                .withDefaultValue(0)
              bcBag.value.foreach(m => votes(m.predict(features)) += 1)
              votes.toSeq.maxBy { case (lbl, v) => (v, -lbl) }._1
            }
          it.map(ex => (ex.label, if (predict(ex.features) == ex.label) 1L else 0L))
        }.toDF("label", "hit")
          .groupBy("label")
          .agg(count(lit(1)).as("n"), sum("hit").as("n_hit"))
          .select(lit(algo).as("algo"), lit(split).as("split"),
            col("label"), col("n"), col("n_hit"),
            (col("n_hit").cast("double") / col("n")).as("acc"))
      score("cascade", "train", train)
        .unionByName(score("cascade", "holdout", holdout))
        .unionByName(score("bagging", "train", train))
        .unionByName(score("bagging", "holdout", holdout))
        .orderBy("algo", "split", "label")
    } finally graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(modelDir))
  }
}
