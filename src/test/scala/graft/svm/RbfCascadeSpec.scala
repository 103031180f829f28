package graft.svm

import graft.SparkSpec

/** End-to-end run of the reference's exact solver configuration (RBF,
  * gamma = 1/dim — cascade_svm/Midcascade.java:62-94) on data where that
  * kernel matters: concentric rings are the canonical case a linear SVM
  * cannot solve and an RBF SVM solves essentially perfectly.
  */
class RbfCascadeSpec extends SparkSpec {

  private val dim = 8

  test("ring data is deterministic and balanced") {
    val a = RingData.rings(spark, n = 400, k = 4, dim = dim).collect().sortBy(_.id)
    val b = RingData.rings(spark, n = 400, k = 4, dim = dim).collect().sortBy(_.id)
    assert(a.map(_.features.toSeq).toSeq == b.map(_.features.toSeq).toSeq)
    assert(a.count(_.label == 0) == 200 && a.count(_.label == 1) == 200)
    // inner ring strictly inside outer ring in the first two dims
    def r2(e: Ex) = e.features(0) * e.features(0) + e.features(1) * e.features(1)
    assert(a.filter(_.label == 0).map(r2).max < a.filter(_.label == 1).map(r2).min)
  }

  test("RBF gamma=1/dim cascade separates the rings; linear cannot") {
    val data = RingData.rings(spark, n = 2000, k = 4, dim = dim)
    val (rbfStats, _) = ParallelSvm.cascade(data, 4, ParallelSvm.rbfParams(dim))
    val rbfAcc = rbfStats.find(s => s.stage == "cascade-final" && s.layer == -1).get.metric
    assert(rbfAcc >= 0.95, s"RBF cascade should solve the rings, got $rbfAcc")

    // linear-on-rings is non-separable, so ~96% of points end up SVs —
    // exactly the regime the dense-SV guard exists to refuse; opt out to
    // run the doomed configuration for the accuracy contrast below
    val (linStats, _) = ParallelSvm.cascade(data, 4, Smo.Params(kernel = Kernel.Linear),
      maxSvFraction = 1.0)
    val linAcc = linStats.find(s => s.stage == "cascade-final" && s.layer == -1).get.metric
    assert(linAcc <= 0.7, s"a linear separator cannot beat the prior on rings, got $linAcc")
    assert(rbfAcc > linAcc + 0.25, s"RBF ($rbfAcc) must clearly beat linear ($linAcc)")
  }

  test("RBF bagging ensemble solves the rings") {
    val data = RingData.rings(spark, n = 2000, k = 4, dim = dim)
    val dir = java.nio.file.Files.createTempDirectory("graft-bag-rbf").toString
    val (stats, models) = ParallelSvm.bagging(data, 4, ParallelSvm.rbfParams(dim), dir)
    assert(models.length == 4)
    val acc = stats.find(_.stage == "bagging-ensemble").get.metric
    assert(acc >= 0.95, s"RBF bagging ensemble on rings, got $acc")
  }

  test("RBF iterative training drives error down on the rings") {
    val data = RingData.rings(spark, n = 2000, k = 4, dim = dim)
    val stats = ParallelSvm.iterative(data, 4, ParallelSvm.rbfParams(dim))
    val rounds = stats.filter(_.stage == "iterative-round")
    assert(rounds.nonEmpty)
    // separable-by-RBF data: total training error must end far below the
    // ~50% a linear model is stuck at (2000 points, 1000 per class)
    assert(rounds.last.metric <= 100.0,
      s"final round error sum ${rounds.last.metric} should be near zero on rings")
  }
}
