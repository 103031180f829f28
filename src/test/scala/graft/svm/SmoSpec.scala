package graft.svm

import org.scalatest.funsuite.AnyFunSuite

class SmoSpec extends AnyFunSuite {

  private def lp(label: Int, fs: Float*) = LabeledVec(label, fs.toArray)

  test("binary linear SVM finds the max-margin separator on 2 points") {
    // Points (-1, 0) and (1, 0); optimal linear SVM: w = (1, 0), b = 0.
    val xs = Array(Array(-1f, 0f), Array(1f, 0f))
    val y = Array[Byte](-1, 1)
    val (alpha, rho) = Smo.solveBinary(xs, y, Smo.Params(kernel = Kernel.Linear, c = 10.0))
    // alpha_1 = alpha_2 = 1/2 (w = sum a_i y_i x_i = (1,0), margin 1)
    assert(math.abs(alpha(0) - 0.5) < 1e-3, s"alpha0=${alpha(0)}")
    assert(math.abs(alpha(1) - 0.5) < 1e-3)
    assert(math.abs(rho) < 1e-3, s"rho=$rho")
  }

  test("asymmetric 1D problem recovers the shifted bias (rho sign)") {
    // Points x=0 (label 0) and x=4 (label 1): separator at x=2, so
    // f(x) = 0.5x - 1 (rho = 1). A rho sign error keeps these two
    // training points correct but misclassifies x=1 as positive.
    val data = Array(lp(0, 0f), lp(1, 4f))
    val model = Smo.train(data, Smo.Params(kernel = Kernel.Linear, c = 100.0))
    assert(model.predict(Array(1f)) == 0, "x=1 is left of the x=2 separator")
    assert(model.predict(Array(3f)) == 1, "x=3 is right of the x=2 separator")
    assert(model.predict(Array(0f)) == 0 && model.predict(Array(4f)) == 1)
  }

  test("binary SVM separates 2D clusters and predicts correctly") {
    val pos = for (a <- 0 until 20) yield lp(1, 2f + (a % 5) * 0.1f, 2f + (a / 5) * 0.1f)
    val neg = for (a <- 0 until 20) yield lp(0, -2f - (a % 5) * 0.1f, -2f - (a / 5) * 0.1f)
    val data = (pos ++ neg).toArray
    val model = Smo.train(data, Smo.Params(kernel = Kernel.Rbf(0.5)))
    assert(data.forall(d => model.predict(d.features) == d.label))
  }

  test("multi-class OVO on 3 separable clusters, deterministic") {
    val data = (for {
      c <- 0 until 3
      i <- 0 until 15
    } yield lp(c, c * 3f + (i % 4) * 0.1f, c * -2f + (i / 4) * 0.1f)).toArray
    val p = Smo.Params(kernel = Kernel.Rbf(1.0))
    val m1 = Smo.train(data, p)
    val m2 = Smo.train(data, p)
    assert(data.forall(d => m1.predict(d.features) == d.label))
    assert(m1.svGlobalIdx.sameElements(m2.svGlobalIdx), "training must be deterministic")
    assert(m1.binaries.length == 3)
    // sv indices are in-bounds, sorted, unique (LibSVM sv_indices contract)
    assert(m1.svGlobalIdx.toSeq == m1.svGlobalIdx.toSeq.sorted.distinct)
  }

  test("XOR needs the RBF kernel (non-linearly-separable)") {
    val data = Array(lp(0, 0f, 0f), lp(1, 0f, 1f), lp(1, 1f, 0f), lp(0, 1f, 1f))
    val model = Smo.train(data, Smo.Params(kernel = Kernel.Rbf(2.0), c = 100.0))
    assert(data.forall(d => model.predict(d.features) == d.label))
  }

  test("full-set KKT criterion holds at exit even when shrinking engaged") {
    // Overlapping classes, n large enough that shrinking fires many
    // times (shrinkEvery = min(n, 1000)). Pins the solution contract
    // shrinking must never weaken: any exit path that declared
    // convergence while shrunk variables still violated KKT would show
    // up here — the eps criterion is recomputed on the FULL problem
    // from the returned alphas, from scratch.
    val rng = new scala.util.Random(7)
    val n = 600
    val xs = Array.tabulate(n) { i =>
      val cls = i % 2
      // means ±0.3 with unit-ish noise: heavily overlapping
      Array.fill(4)(((if (cls == 1) 0.3 else -0.3) + rng.nextGaussian()).toFloat)
    }
    val y = Array.tabulate(n)(i => if (i % 2 == 1) 1.toByte else (-1).toByte)
    val p = Smo.Params(kernel = Kernel.Linear, c = 1.0)
    val (alpha, _) = Smo.solveBinary(xs, y, p)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var k = 0
      while (k < a.length) { s += a(k).toDouble * b(k); k += 1 }; s
    }
    val grad = Array.tabulate(n) { t =>
      var s = 0.0
      for (j <- 0 until n if alpha(j) > 0) s += alpha(j) * y(j) * dot(xs(j), xs(t))
      y(t) * s - 1.0
    }
    var gmax = Double.NegativeInfinity; var gmin = Double.PositiveInfinity
    for (t <- 0 until n) {
      val v = -y(t) * grad(t)
      val inUp  = (y(t) > 0 && alpha(t) < p.c) || (y(t) < 0 && alpha(t) > 0)
      val inLow = (y(t) > 0 && alpha(t) > 0)   || (y(t) < 0 && alpha(t) < p.c)
      if (inUp && v > gmax) gmax = v
      if (inLow && v < gmin) gmin = v
    }
    assert(gmax - gmin <= p.eps + 1e-9,
      s"full-set KKT violation ${gmax - gmin} exceeds eps=${p.eps}")
  }

  test("alphas respect the box and the equality constraint") {
    val pos = for (a <- 0 until 10) yield lp(1, 1f + a * 0.05f, 0.5f)
    val neg = for (a <- 0 until 10) yield lp(0, -1f - a * 0.05f, -0.5f)
    val xs = (pos ++ neg).map(_.features).toArray
    val y = (pos ++ neg).map(l => if (l.label == 1) 1.toByte else (-1).toByte).toArray
    val c = 1.0
    val (alpha, _) = Smo.solveBinary(xs, y, Smo.Params(kernel = Kernel.Linear, c = c))
    assert(alpha.forall(a => a >= -1e-12 && a <= c + 1e-12))
    val balance = alpha.zip(y).map { case (a, yy) => a * yy }.sum
    assert(math.abs(balance) < 1e-9, s"sum alpha_i y_i = $balance")
  }
}
