package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` / `array<double>`
  * columns, backed by the native codegen expressions in
  * [[VectorExpressions]] (higher-order-function formulations are
  * CodegenFallback — interpreted with per-element boxing, the wrong
  * shape for a 100 TB scoring/similarity pass).
  *
  * These are the building blocks for the similarity-search and
  * embedding-dedup operators (SURVEY.md §2c) and for scoring linear SVM
  * models (reference: per-record kernel evaluations in
  * cascade_svm/Midcascade.java:101-131, re-expressed declaratively).
  */
object VectorOps {

  private def col2e(c: Column) =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)
  private def e2col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(e)

  /** Σ a_i * b_i in double precision. */
  def dot(a: Column, b: Column): Column =
    e2col(DotProductExpr(col2e(a), col2e(b)))

  /** Σ a_i^2. */
  def normSq(a: Column): Column = dot(a, a)

  /** ||a||_2. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** cos(a, b) = a·b / (||a|| ||b||); 0.0 when either norm is 0.
    * Single pass: dot and both norms in one loop.
    */
  def cosine(a: Column, b: Column): Column =
    e2col(CosineSimExpr(col2e(a), col2e(b)))

  /** ||a - b||^2 (squared euclidean). */
  def distSq(a: Column, b: Column): Column =
    e2col(DistSqExpr(col2e(a), col2e(b)))

  /** RBF kernel value exp(-gamma * ||a-b||^2). */
  def rbf(a: Column, b: Column, gamma: Double): Column =
    exp(-lit(gamma) * distSq(a, b))

  /** Literal-matrix mat-vec `m · v` (array<double> out) — one codegen
    * node with the matrix as a referenced constant; see
    * [[MatVecLitExpr]] for why the unrolled-lit alternative is wrong.
    */
  def matVec(m: Array[Array[Double]], v: Column): Column =
    e2col(MatVecLitExpr(m, col2e(v)))

  /** Argmin-distance centroid over a literal centroid table, returning
    * `ids(argmin)`; ties to the first position — the rule
    * array_position(dists, array_min(dists)) applied. Referenced-
    * constant codegen ([[NearestCentroidExpr]]).
    */
  def nearestCentroid(ids: Array[Int], cents: Array[Array[Double]], v: Column): Column =
    e2col(NearestCentroidExpr(ids, cents, col2e(v)))

  /** PQ asymmetric (ADC) squared distance of a raw vector against an
    * m-code column under literal codebooks ([[AdcDistExpr]]).
    */
  def adcDist(books: Array[Array[Array[Double]]], v: Column, codes: Column): Column =
    e2col(AdcDistExpr(books, col2e(v), col2e(codes)))
}
