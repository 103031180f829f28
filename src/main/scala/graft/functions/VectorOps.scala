package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` / `array<double>` columns.
  *
  * Built from `zip_with` / `aggregate` / `transform` so every expression
  * stays inside whole-stage codegen — no UDF boxing on the hot path.
  * These are the building blocks for the similarity-search and
  * embedding-dedup operators (SURVEY.md §2c) and for scoring linear SVM
  * models (reference: per-record kernel evaluations in
  * cascade_svm/Midcascade.java:101-131, re-expressed declaratively).
  */
object VectorOps {

  /** Σ a_i * b_i (inputs cast to double element-wise). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** Σ a_i^2. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  /** ||a||_2. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** cos(a, b) = a·b / (||a|| ||b||); 0.0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, 0.0).otherwise(d / nn)
  }

  /** ||a - b||^2 (squared euclidean). */
  def distSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** RBF kernel value exp(-gamma * ||a-b||^2). */
  def rbf(a: Column, b: Column, gamma: Double): Column =
    exp(-lit(gamma) * distSq(a, b))
}
