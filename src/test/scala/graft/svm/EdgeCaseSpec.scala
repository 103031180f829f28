package graft.svm

import graft.SparkSpec

/** Degenerate shapes the meta-algorithms must survive at scale:
  * single-class partitions, k=1 (no parallelism), tiny subsets.
  */
class EdgeCaseSpec extends SparkSpec {

  private def params = ParallelSvm.defaultParams(dim = 64)

  test("SMO on a single-class partition yields a constant classifier") {
    val data = Array.tabulate(20)(i => LabeledVec(7, Array.fill(4)(i.toFloat)))
    val m = Smo.train(data, Smo.Params(kernel = Kernel.Linear))
    assert(m.labels.toSeq == Seq(7))
    assert(m.binaries.isEmpty)
    assert(m.predict(Array(1f, 2f, 3f, 4f)) == 7)
  }

  test("SMO on two points per class stays deterministic and separable") {
    val data = Array(
      LabeledVec(0, Array(0f, 0f)), LabeledVec(0, Array(0.1f, 0f)),
      LabeledVec(1, Array(1f, 1f)), LabeledVec(1, Array(0.9f, 1f)))
    val m = Smo.train(data, Smo.Params(kernel = Kernel.Linear))
    assert(data.forall(d => m.predict(d.features) == d.label))
  }

  test("cascade with k=1 degenerates to a single direct solve") {
    val data = ParallelSvm.loadTraining(spark, sf0001, k = 1)
    val (stats, model) = ParallelSvm.cascade(data, k = 1, params)
    assert(model != null && model.labels.length == 10)
    val acc = stats.find(s => s.stage == "cascade-final" && s.layer == -1).get.metric
    assert(acc > 0.3)
  }

  test("bagging with k=1 is a single-model 'ensemble'") {
    val data = ParallelSvm.loadTraining(spark, sf0001, k = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-bag-k1").toString
    val (stats, models) = ParallelSvm.bagging(data, k = 1, params, dir)
    assert(models.length == 1)
    assert(stats.exists(_.stage == "bagging-ensemble"))
  }

  test("cascade with single-class subsets keeps every class alive") {
    import spark.implicits._
    // subset == label % 2 correlation: each layer-1 subset sees ONE class
    val rows = (0 until 80).map { i =>
      val label = i % 2
      Ex(i.toLong, label, Array.fill(8)((i % 5).toFloat + label * 10f), label)
    }
    val (stats, model) = ParallelSvm.cascade(rows.toDS(), k = 2,
      Smo.Params(kernel = Kernel.Linear))
    assert(model.labels.toSeq == Seq(0, 1),
      "both classes must survive single-class layer-1 subsets")
    val acc = stats.find(s => s.stage == "cascade-final" && s.layer == -1).get.metric
    assert(acc > 0.9, s"separable data must classify: acc=$acc")
  }

  test("iterative with a subset that holds a single class still converges") {
    import spark.implicits._
    // 3 subsets; subset 2 carries only label 9 — its per-subset solve is
    // single-class until global SVs arrive in round 2.
    val rows = (0 until 90).map { i =>
      val label = if (i % 3 == 2) 9 else i % 2
      Ex(i.toLong, label, Array.fill(8)((i % 7).toFloat), i % 3)
    }
    val ds = rows.toDS()
    val stats = ParallelSvm.iterative(ds, k = 3, Smo.Params(kernel = Kernel.Linear))
    assert(stats.nonEmpty)
    assert(stats.count(_.stage == "iterative-round") <= 3)
  }
}
