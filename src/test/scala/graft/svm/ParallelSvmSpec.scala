package graft.svm

import graft.SparkSpec

class ParallelSvmSpec extends SparkSpec {

  private def params = ParallelSvm.defaultParams(dim = 64)

  test("cascade SVM: layers shrink, final model is accurate") {
    val data = ParallelSvm.loadTraining(spark, sf0001, k = 4)
    // the noisy embeddings are the dense-SV regime — opt out of the guard
    val (stats, model) = ParallelSvm.cascade(data, k = 4, params, maxSvFraction = 1.0)
    val layer1 = stats.filter(s => s.stage == "cascade" && s.layer == 1)
    assert(layer1.nonEmpty)
    // The synthetic embeddings are intrinsically noisy: a full linear
    // least-squares fit tops out at 0.39 train accuracy, random = 0.10.
    // The cascade must land at that ceiling, far above random.
    val finalAcc = stats.find(s => s.stage == "cascade-final" && s.layer == -1).get.metric
    assert(finalAcc > 0.35, s"cascade training accuracy $finalAcc")
    assert(model.labels.length == 10)
    // cascade contract: only support vectors survive a layer
    val totalSvL1 = layer1.map(_.nSv).sum
    assert(totalSvL1 <= 500, s"layer-1 SVs $totalSvL1 cannot exceed input 500")
  }

  test("cascade is deterministic across runs") {
    val data = ParallelSvm.loadTraining(spark, sf0001, k = 4)
    val (s1, _) = ParallelSvm.cascade(data, k = 4, params, maxSvFraction = 1.0)
    val (s2, _) = ParallelSvm.cascade(data, k = 4, params, maxSvFraction = 1.0)
    assert(s1 == s2)
  }

  test("bagging SVM: k base models, ensemble accuracy") {
    val data = ParallelSvm.loadTraining(spark, sf0001, k = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-bag").toString
    val (stats, models) = ParallelSvm.bagging(data, k = 4, params, dir)
    assert(models.length == 4)
    // Base models see only ~62 rows each on this noisy data, so the
    // ensemble sits between random (0.10) and the 0.39 data ceiling.
    val acc = stats.find(_.stage == "bagging-ensemble").get.metric
    assert(acc > 0.2, s"bagging ensemble accuracy $acc")
    assert(stats.count(_.stage == "bagging") == 4)
  }

  test("bagging persists one model file per subset; driver holds only stats") {
    val data = ParallelSvm.loadTraining(spark, sf0001, k = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-bag-fs").toString
    val (stats, _) = ParallelSvm.bagging(data, k = 4, params, dir)
    // The reference contract: model-<taskId>.model lands on the shared FS
    // (Bagging_svm/Bagging1.java:107-132); here one LibSVM text file per subset.
    val files = (0 until 4).map(s => new java.io.File(s"$dir/model-$s.model"))
    assert(files.forall(f => f.isFile && f.length > 0),
      s"expected 4 persisted base models in $dir")
    // Persisted models round-trip into working classifiers.
    val m = ModelIO.load(spark, files.head.getPath)
    assert(m.labels.nonEmpty)
    // Stats carry no model payload — one row per subset + one ensemble row.
    assert(stats.length == 5)
  }

  test("bagging refuses to broadcast an ensemble above the size guard") {
    val data = ParallelSvm.loadTraining(spark, sf0001, k = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-bag-guard").toString
    val e = intercept[IllegalArgumentException] {
      ParallelSvm.bagging(data, k = 2, params, dir, maxEnsembleBytes = 10L)
    }
    assert(e.getMessage.contains("broadcast guard"))
  }

  test("cascade dense-SV guard trips on the noisy embeddings, not on the rings") {
    // Embeddings: ~100% of points are bound SVs under the linear kernel,
    // so layer 1 forwards essentially everything and every later merge
    // is O(n²) — the guard must fire before any merge layer runs.
    val dense = ParallelSvm.loadTraining(spark, sf0001, k = 4)
    val e = intercept[IllegalStateException] {
      ParallelSvm.cascade(dense, k = 4, params)
    }
    assert(e.getMessage.contains("svm_linear_train"), e.getMessage)
    assert(e.getMessage.contains("maxSvFraction"), e.getMessage)
    // The failure names the measured fraction, proving it came from the
    // layer-1 census and not a static heuristic.
    val kept = "kept (\\d+) of (\\d+)".r.findFirstMatchIn(e.getMessage).get
    assert(kept.group(1).toInt > 0.9 * kept.group(2).toInt)

    // Rings under the reference RBF config: SVs ≈ 30% of input — the
    // guard's premise (shrinking layers) holds and training completes.
    val rings = RingData.rings(spark, n = 400, k = 4, dim = 8)
    val (stats, model) = ParallelSvm.cascade(rings, k = 4, ParallelSvm.rbfParams(8))
    assert(model != null)
    val l1 = stats.filter(s => s.stage == "cascade" && s.layer == 1).map(_.nSv).sum
    assert(l1 < 0.9 * 400, s"rings layer-1 SV count $l1 should be sparse")
  }

  test("cascadeAutoTrain routes the dense regime to the linear path, switch recorded in the trace") {
    val rows = SvmQueries.cascadeAutoTrain(spark, sf0001).collect()
    val stages = rows.map(_.getString(0))
    // the paid layer-1 census is preserved, the switch row is loud, and
    // the linear training summary follows in the same schema
    assert(stages.contains("cascade"), "layer-1 census rows must survive the reroute")
    val marker = rows.filter(_.getString(0) == "dense_fallback")
    assert(marker.length == 1, "exactly one fallback marker row")
    assert(marker(0).getDouble(5) > 0.9, "marker metric = the tripping SV fraction")
    val linear = rows.filter(_.getString(0) == "linear")
    assert(linear.length == 11, "10 per-class rows + the accuracy row")
    // 10-class chance is 0.1; the noisy 500-row sf0.001 slice trains to
    // ~0.44 — the bar is "far above chance", not a quality pin
    val acc = linear.find(_.getInt(2) == -1).get.getDouble(5)
    assert(acc > 0.3, s"fallback linear model must actually train (acc=$acc)")
  }

  test("iterative fails loudly when the global-SV set exceeds maxGlobalSvs") {
    // The noisy embeddings are adversarial for iterative SVM: nearly every
    // point is a bound SV, so round 1 already overflows a tiny cap.
    val data = ParallelSvm.loadTraining(spark, sf0001, k = 4)
    val e = intercept[IllegalStateException] {
      ParallelSvm.iterative(data, k = 4, params, maxIters = 3, maxGlobalSvs = 50)
    }
    assert(e.getMessage.contains("maxGlobalSvs"))
    // PRE-COLLECT contract: the failure message carries the PROSPECTIVE
    // set size — computable only from the executor-side count() that runs
    // before any SV row is collected. On this slice nearly all 500 rows
    // are bound SVs, so the round-1 prospective size must reflect that
    // (≫ the 50-cap), proving the guard saw the full overflow without the
    // driver ever holding the rows; the collect paths below the guard are
    // bounded by maxGlobalSvs by construction.
    assert(e.getMessage.contains("would grow"))
    val prospective = "to (\\d+)".r.findFirstMatchIn(e.getMessage).get.group(1).toInt
    assert(prospective > 400, s"round-1 prospective SV count $prospective should be ≈ data size")
  }

  test("cascade persists its final model executor-side; reload agrees with returned model") {
    // The reference's entire output contract is the saved model
    // (Lastcascade.java:31-37 saveModelToHdfs, called at :136): a LibSVM
    // user must be able to load what the cascade produced.
    val data = ParallelSvm.loadTraining(spark, sf0001, k = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-casc-io").toString
    val path = s"$dir/final.model"
    val (_, model) = ParallelSvm.cascade(data, k = 4, params,
      modelPath = Some(path), maxSvFraction = 1.0)
    val f = new java.io.File(path)
    assert(f.isFile && f.length > 0, s"expected persisted final model at $path")
    val loaded = ModelIO.load(spark, path)
    val rows = data.collect()
    val agree = rows.count(r => loaded.predict(r.features) == model.predict(r.features))
    assert(agree == rows.length,
      s"reloaded model disagrees with returned model on ${rows.length - agree}/${rows.length} rows")
  }

  test("iterative SVM: error decreases or loop stops, <= 3 rounds") {
    val data = ParallelSvm.loadTraining(spark, sf0001, k = 4)
    val stats = ParallelSvm.iterative(data, k = 4, params)
    val rounds = stats.filter(_.stage == "iterative-round")
    assert(rounds.nonEmpty && rounds.length <= 3)
    // round error sums are monotone over the executed rounds except the last
    val errs = rounds.map(_.metric)
    assert(errs.zip(errs.tail).forall { case (a, b) => b <= a || rounds.last.metric == b })
  }

  test("referenceStop reproduces the reference's 2-round errorsum trace") {
    // Reference trace (Driver.java:71-86): do-while
    // `newerrorsum < olderrorsum && i < 3`, i from 1 — round 1 always
    // "improves" on Long.MAX_VALUE and `i < 3` cuts after round 2, so
    // the loop runs EXACTLY two rounds; the metric is the errorsum
    // counter: per class, (long)(errorRate*100) (Itergsv.java:96-97).
    val data = RingData.rings(spark, n = 400, k = 4, dim = 8)
    val rbf = ParallelSvm.rbfParams(8)
    val ref = ParallelSvm.iterative(data, k = 4, rbf, referenceStop = true)
    val refRounds = ref.filter(_.stage == "iterative-round")
    assert(refRounds.length == 2, s"reference trace must run exactly 2 rounds: $refRounds")
    // errorsum is a sum of truncated percent points — always integral
    refRounds.foreach(r => assert(r.metric == r.metric.floor, s"non-integral errorsum: $r"))
    // per-class truncated percents are bounded by 100 * classes * subsets
    assert(refRounds.head.metric <= 100.0 * 10 * 4)
    // default mode on the same slice: same algorithm, finer metric
    // (raw misclassification counts), up to 3 rounds
    val std = ParallelSvm.iterative(data, k = 4, rbf)
    val stdRounds = std.filter(_.stage == "iterative-round")
    assert(stdRounds.nonEmpty && stdRounds.length <= 3)
    // both traces grow the same round-1 global-SV set: the stop rule
    // changes WHEN training stops, never what a round trains
    assert(refRounds.head.nIn == stdRounds.head.nIn,
      "round-1 global-SV count must be identical under both stop rules")
  }

  test("accuracy helper agrees with confusion matrix") {
    val data = ParallelSvm.loadTraining(spark, sf0001, k = 1)
    val rows = data.collect()
    val model = Smo.train(rows.map(r => LabeledVec(r.label, r.features)), params)
    val acc = ParallelSvm.accuracy(data, model)
    val cm = ParallelSvm.confusion(data, model).collect()
    val correct = cm.filter(r => r.getInt(0) == r.getInt(1)).map(_.getLong(2)).sum
    val total = cm.map(_.getLong(2)).sum
    assert(math.abs(acc - correct.toDouble / total) < 1e-12)
    assert(total == 500)
  }
}
