package graft.svm

import graft.SparkSpec

class ParallelSvmSpec extends SparkSpec {

  private def params = ParallelSvm.defaultParams(dim = 64)

  test("cascade SVM: layers shrink, final model is accurate") {
    val data = ParallelSvm.loadTraining(spark, sf0001, k = 4)
    val (stats, model) = ParallelSvm.cascade(data, k = 4, params)
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
    val (s1, _) = ParallelSvm.cascade(data, k = 4, params)
    val (s2, _) = ParallelSvm.cascade(data, k = 4, params)
    assert(s1 == s2)
  }

  test("bagging SVM: k base models, ensemble accuracy") {
    val data = ParallelSvm.loadTraining(spark, sf0001, k = 4)
    val (stats, models) = ParallelSvm.bagging(data, k = 4, params)
    assert(models.length == 4)
    // Base models see only ~62 rows each on this noisy data, so the
    // ensemble sits between random (0.10) and the 0.39 data ceiling.
    val acc = stats.find(_.stage == "bagging-ensemble").get.metric
    assert(acc > 0.2, s"bagging ensemble accuracy $acc")
    assert(stats.count(_.stage == "bagging") == 4)
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
