package graft.svm

import scala.collection.mutable

/** Kernel functions over dense float vectors. */
sealed trait Kernel extends Serializable {
  def apply(a: Array[Float], b: Array[Float]): Double
  def name: String
}
object Kernel {
  case object Linear extends Kernel {
    def apply(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def name = "linear"
  }
  final case class Rbf(gamma: Double) extends Kernel {
    def apply(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      math.exp(-gamma * s)
    }
    def name = "rbf"
  }
}

/** One labelled training example. */
final case class LabeledVec(label: Int, features: Array[Float])

/** Solution of one binary sub-problem (labels mapped to +1 / -1). */
final case class BinarySvm(
    alphaY: Array[Double],     // alpha_i * y_i for the support vectors
    svLocal: Array[Int],       // indices into the local training set
    rho: Double,               // decision f(x) = sum alphaY_i K(sv_i, x) - rho
    posLabel: Int,
    negLabel: Int
)

/** Sequential Minimal Optimization solver for C-SVC — the per-partition
  * core solver of this engine, playing the role LibSVM's `svm_train`
  * plays inside the reference's mappers/reducers
  * (cascade_svm/Midcascade.java:95-98, Bagging_svm/Bagging1.java:122-123,
  * Iterative_svm/Itergsv.java:92-93).
  *
  * Deterministic: maximal-violating-pair working-set selection (WSS1 of
  * Fan, Chen & Lin 2005 — the published LIBSVM algorithm), no random
  * starts, so repeated runs on the same partition yield identical models.
  * Parameters default to LibSVM's defaults used by the reference
  * (cascade_svm/Midcascade.java:62-94): C=1, eps=1e-3, RBF with
  * gamma = 1 / num_features.
  */
object Smo {

  final case class Params(
      c: Double = 1.0,
      eps: Double = 1e-3,
      kernel: Kernel,
      maxIter: Int = 200000
  )

  /** Solve one binary problem. `y` entries must be +1.0 / -1.0.
    *
    * Shrinking (Fan, Chen & Lin 2005 §4; LibSVM Solver::do_shrinking):
    * every min(n, 1000) iterations, variables that sit at a bound and
    * satisfy KKT beyond the current violating-pair extremes are removed
    * from the working set — they can only re-enter the solution after
    * the extremes move past them, so the per-iteration WSS scan and
    * gradient update run over the (usually much smaller) active set.
    * When the active problem converges, gradients of the shrunk
    * variables are reconstructed from scratch and optimization resumes
    * over the full set; the solver only reports convergence when the
    * FULL problem satisfies the eps criterion, so shrinking changes
    * iteration cost, never the solution contract.
    */
  def solveBinary(xs: Array[Array[Float]], y: Array[Byte], p: Params): (Array[Double], Double) = {
    val n = xs.length
    val alpha = new Array[Double](n)
    // gradient of the dual objective: G_i = sum_j alpha_j y_i y_j K_ij - 1
    val grad = Array.fill(n)(-1.0)

    // Kernel row cache (bounded) — same role as LibSVM's kernel cache.
    val maxCachedRows = math.max(2, math.min(n, (256L * 1024 * 1024 / math.max(1, 8L * n)).toInt))
    val cache = new mutable.LinkedHashMap[Int, Array[Double]]
    def kRow(i: Int): Array[Double] = cache.get(i) match {
      case Some(r) => r
      case None =>
        val r = new Array[Double](n)
        var j = 0
        while (j < n) { r(j) = p.kernel(xs(i), xs(j)); j += 1 }
        if (cache.size >= maxCachedRows) cache.remove(cache.head._1)
        cache.put(i, r)
        r
    }

    // Active set: indices active(0 until activeSize) participate in WSS
    // and gradient updates; the rest are shrunk at a bound with stale
    // gradients until reconstruction.
    val active = Array.tabulate(n)(identity)
    var activeSize = n
    val shrinkEvery = math.max(1, math.min(n, 1000))
    var sinceShrink = shrinkEvery

    // Recompute G_t for the shrunk tail from alpha directly:
    // G_t = y_t * (sum_j alpha_j y_j K_jt) - 1. Runs rarely (on active-
    // set convergence and before rho), cost O(n_shrunk * n_sv) kernel
    // evaluations.
    def reconstructGradient(): Unit = {
      var ti = activeSize
      while (ti < n) {
        val t = active(ti)
        var s = 0.0
        var j2 = 0
        while (j2 < n) {
          if (alpha(j2) > 0) s += alpha(j2) * y(j2) * p.kernel(xs(j2), xs(t))
          j2 += 1
        }
        grad(t) = y(t) * s - 1.0
        ti += 1
      }
    }

    var iter = 0
    var converged = false
    while (!converged && iter < p.maxIter) {
      // WSS1: i = argmax_{t in I_up} -y_t G_t ; j = argmin_{t in I_low} -y_t G_t
      var i = -1; var gmax = Double.NegativeInfinity
      var j = -1; var gmin = Double.PositiveInfinity
      var ti = 0
      while (ti < activeSize) {
        val t = active(ti)
        val yt = y(t)
        val v = -yt * grad(t)
        val inUp  = (yt > 0 && alpha(t) < p.c) || (yt < 0 && alpha(t) > 0)
        val inLow = (yt > 0 && alpha(t) > 0)   || (yt < 0 && alpha(t) < p.c)
        if (inUp && v > gmax) { gmax = v; i = t }
        if (inLow && v < gmin) { gmin = v; j = t }
        ti += 1
      }
      if (i == -1 || j == -1 || gmax - gmin < p.eps) {
        if (activeSize == n) converged = true
        else {
          // Active problem converged: bring the shrunk variables back
          // and keep optimizing — convergence is only ever declared on
          // the full set.
          reconstructGradient()
          activeSize = n
          sinceShrink = shrinkEvery
        }
      } else {
        // Scheduled shrinking, using this iteration's extremes. The
        // selected pair (i, j) is never shrinkable: both violate KKT at
        // the current extremes by construction.
        sinceShrink -= 1
        if (sinceShrink == 0) {
          sinceShrink = shrinkEvery
          var u = 0
          while (u < activeSize) {
            val t = active(u)
            val atLower = alpha(t) <= 0.0
            val atUpper = alpha(t) >= p.c
            val v = -y(t) * grad(t)
            // at a bound, a variable is in exactly one of I_up / I_low:
            // I_up-only members can only be selected as i (argmax), so
            // v < gmin means KKT-satisfied beyond the extremes; dually
            // for I_low-only members.
            val inUpOnly  = (atLower && y(t) > 0) || (atUpper && y(t) < 0)
            val inLowOnly = (atLower && y(t) < 0) || (atUpper && y(t) > 0)
            val shrunk = (inUpOnly && v < gmin) || (inLowOnly && v > gmax)
            if (shrunk) {
              activeSize -= 1
              val tmp = active(activeSize); active(activeSize) = active(u); active(u) = tmp
            } else u += 1
          }
        }
        val ki = kRow(i); val kj = kRow(j)
        val yi = y(i).toDouble; val yj = y(j).toDouble
        var eta = ki(i) + kj(j) - 2.0 * ki(j) // u^T Q u with u_i=y_i, u_j=-y_j: the y factors cancel
        if (eta <= 0) eta = 1e-12
        // two-variable analytic update (equality constraint sum alpha_i y_i = 0)
        val delta = (gmax - gmin) / eta // = (-yi*grad(i) + yj*grad(j)) / eta
        val oldAi = alpha(i); val oldAj = alpha(j)
        var ai = oldAi + yi * delta
        var aj = oldAj - yj * delta
        // clip to the box keeping yi*ai + yj*aj constant
        val sum = yi * oldAi + yj * oldAj
        if (ai < 0) ai = 0
        if (ai > p.c) ai = p.c
        aj = yj * (sum - yi * ai)
        if (aj < 0) { aj = 0; ai = yi * (sum - yj * aj) }
        if (aj > p.c) { aj = p.c; ai = yi * (sum - yj * aj) }
        if (ai < 0) ai = 0 else if (ai > p.c) ai = p.c
        val dAi = ai - oldAi; val dAj = aj - oldAj
        if (math.abs(dAi) < 1e-14 && math.abs(dAj) < 1e-14) {
          // Numerical stall: the active-set maximal violating pair is
          // box-clipped into no progress. Like the eps branch above,
          // this may only terminate the solver on the FULL set —
          // otherwise shrunk variables whose gradients drifted back
          // into violation would never be reconsidered.
          if (activeSize == n) converged = true
          else {
            reconstructGradient()
            activeSize = n
            sinceShrink = shrinkEvery
          }
        } else {
          // gradient update over the ACTIVE set only — shrunk gradients
          // stay stale until reconstruction
          var u = 0
          while (u < activeSize) {
            val t = active(u)
            grad(t) += y(t) * (yi * dAi * ki(t) + yj * dAj * kj(t))
            u += 1
          }
          alpha(i) = ai; alpha(j) = aj
        }
      }
      iter += 1
    }

    // Every exit path (numerical stall, maxIter) must leave the full
    // gradient fresh for the rho computation below.
    if (activeSize < n) reconstructGradient()

    // rho (LIBSVM Solver::calculate_rho): for a free SV (0 < alpha < C)
    // the KKT condition gives y_i f(x_i) = 1, which rearranges to
    // y_i G_i = -b, so rho := -b = mean of y_i G_i over free SVs.
    // Decision function: f(x) = sum alphaY_i K(sv_i, x) - rho.
    var rhoSum = 0.0; var nFree = 0
    var lb = Double.NegativeInfinity; var ub = Double.PositiveInfinity
    var t2 = 0
    while (t2 < n) {
      val yg = -y(t2) * grad(t2) // = b estimate at t2
      val inUp  = (y(t2) > 0 && alpha(t2) < p.c) || (y(t2) < 0 && alpha(t2) > 0)
      val inLow = (y(t2) > 0 && alpha(t2) > 0)   || (y(t2) < 0 && alpha(t2) < p.c)
      if (alpha(t2) > 0 && alpha(t2) < p.c) { rhoSum += yg; nFree += 1 }
      if (inUp)  lb = math.max(lb, yg)
      if (inLow) ub = math.min(ub, yg)
      t2 += 1
    }
    val rho = if (nFree > 0) -rhoSum / nFree else -(lb + ub) / 2.0
    (alpha, rho)
  }

  /** Train a one-vs-one multi-class C-SVC (LibSVM's strategy for
    * C_SVC) over the given examples. Deterministic.
    */
  def train(data: Array[LabeledVec], params: Params): SvmModel = {
    require(data.nonEmpty, "empty training partition")
    val labels = data.map(_.label).distinct.sorted
    val byLabel: Map[Int, Array[Int]] =
      data.indices.toArray.groupBy(i => data(i).label)
    val binaries = mutable.ArrayBuffer.empty[BinarySvm]
    val svSet = mutable.TreeSet.empty[Int]
    for {
      a <- labels.indices
      b <- (a + 1) until labels.length
    } {
      val (la, lbL) = (labels(a), labels(b))
      val idx = byLabel(la) ++ byLabel(lbL) // stable order: all la then all lb
      val xs = idx.map(i => data(i).features)
      val y  = idx.map(i => if (data(i).label == la) 1.toByte else (-1).toByte)
      val (alpha, rho) = solveBinary(xs, y, params)
      val svLoc = alpha.indices.filter(i => alpha(i) > 1e-12).toArray
      val bsvm = BinarySvm(
        alphaY = svLoc.map(i => alpha(i) * y(i)),
        svLocal = svLoc.map(idx), // back to indices in `data`
        rho = rho,
        posLabel = la,
        negLabel = lbL
      )
      binaries += bsvm
      svLoc.foreach(i => svSet += idx(i))
    }
    val svIdx = svSet.toArray // sorted — mirrors LibSVM sv_indices semantics
    SvmModel(
      labels = labels,
      supportVectors = svIdx.map(i => data(i)),
      svGlobalIdx = svIdx,
      binaries = binaries.toArray.map { bs =>
        // remap sv indices into the model's SV array
        val remap = svIdx.zipWithIndex.toMap
        bs.copy(svLocal = bs.svLocal.map(remap))
      },
      kernel = params.kernel,
      c = params.c
    )
  }
}

/** A trained multi-class (one-vs-one) kernel SVM.
  *
  * `svGlobalIdx` are indices into the ORIGINAL training array — the
  * exact analogue of LibSVM's `model.sv_indices` that the reference uses
  * to route support vectors to the next cascade layer
  * (cascade_svm/Midcascade.java:123-129).
  */
final case class SvmModel(
    labels: Array[Int],
    supportVectors: Array[LabeledVec],
    svGlobalIdx: Array[Int],
    binaries: Array[BinarySvm],
    kernel: Kernel,
    c: Double
) extends Serializable {

  /** For the linear kernel each binary machine collapses to a single
    * primal weight vector w = Σ alphaY_i·sv_i: scoring drops from
    * O(n_sv·d) kernel evaluations to one O(d) dot product. Crucial on
    * non-separable data where nearly every point is a bound SV (n_sv ≈
    * n) — there the kernel-expansion path costs n_sv× more per example.
    */
  @transient private lazy val linearWeights: Array[Array[Double]] =
    binaries.map { bs =>
      val d = if (supportVectors.nonEmpty) supportVectors(0).features.length else 0
      val w = new Array[Double](d)
      var i = 0
      while (i < bs.svLocal.length) {
        val f = supportVectors(bs.svLocal(i)).features
        val a = bs.alphaY(i)
        var j = 0
        while (j < d) { w(j) += a * f(j); j += 1 }
        i += 1
      }
      w
    }

  /** One-vs-one majority vote, ties broken by smaller label (LibSVM rule). */
  def predict(x: Array[Float]): Int = {
    if (labels.length == 1) return labels(0)
    val votes = mutable.Map.empty[Int, Int].withDefaultValue(0)
    if (kernel == Kernel.Linear) {
      var b = 0
      while (b < binaries.length) {
        val bs = binaries(b); val w = linearWeights(b)
        var f = -bs.rho
        var j = 0
        while (j < w.length) { f += w(j) * x(j); j += 1 }
        votes(if (f > 0) bs.posLabel else bs.negLabel) += 1
        b += 1
      }
    } else {
      val kv = supportVectors.map(sv => kernel(sv.features, x)) // shared across binaries
      binaries.foreach { bs =>
        var f = -bs.rho
        var i = 0
        while (i < bs.svLocal.length) { f += bs.alphaY(i) * kv(bs.svLocal(i)); i += 1 }
        votes(if (f > 0) bs.posLabel else bs.negLabel) += 1
      }
    }
    votes.toSeq.maxBy { case (lbl, v) => (v, -lbl) }._1
  }

  def errorCount(data: Iterable[LabeledVec]): Int =
    data.count(d => predict(d.features) != d.label)
}
