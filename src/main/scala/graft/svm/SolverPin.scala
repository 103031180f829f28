package graft.svm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Closed-form numeric fidelity pins for the SMO solver — the external
  * ground truth the training pipelines' rows-only checks lack.
  *
  * Each problem's max-margin solution is known analytically (KKT by
  * hand), so the solver's α-vector, support-vector set, rho and dual
  * objective are compared against EXACT literals, not against "it
  * ran". The reference's per-partition solver is LibSVM
  * (cascade_svm/Midcascade.java:62-94); these pins prove this engine's
  * [[Smo.solveBinary]] solves the same optimization to the same
  * numbers:
  *
  *  - p1_sym: x=(±1,0), y=±1 ⇒ w=(1,0), b=0, α=(0.5, 0.5), obj=0.5 —
  *    the textbook two-point problem; one analytic SMO step must land
  *    on it exactly.
  *  - p2_offset: x=(4,1) vs (0,1) ⇒ w=(0.5,0), b=-1 (rho=+1),
  *    α=(0.125, 0.125), obj=0.125 — non-zero bias and non-unit margin.
  *  - p3_bounded: x=(±0.5,0) with C=0.4 — the separable solution needs
  *    α=2 (w=(2,0) for a unit margin), so both α clip EXACTLY at the
  *    box C=0.4 ⇒ w=(0.4,0), rho=0, obj = 0.8 − ½·0.16·(αᵀQα=1) =
  *    0.72 — exercises the box constraint on a non-degenerate pair
  *    (η = K₁₁+K₂₂−2K₁₂ = 1 > 0).
  *  - p4_interior: p2 plus an interior point per class ((6,1), (-2,1))
  *    ⇒ same hyperplane; interior α must be EXACTLY 0 (complementary
  *    slackness), SV set = the p2 pair — exercises SV selection, not
  *    just the final geometry.
  *
  * Output: one row per training point with its α, SV membership, and
  * the problem-level rho / dual objective Σα − ½αᵀQα, every number a
  * literal in the SQL oracle. The solve is driver-local by design —
  * the DISTRIBUTION of solves is covered by the cascade/bagging/
  * iterative contracts; this pin isolates the solver numerics.
  */
object SolverPin {

  private final case class Pt(x: Array[Float], y: Int)

  private val problems: Seq[(String, Double, Seq[Pt])] = Seq(
    ("p1_sym", 1.0, Seq(
      Pt(Array(1f, 0f), 1), Pt(Array(-1f, 0f), -1))),
    ("p2_offset", 1.0, Seq(
      Pt(Array(4f, 1f), 1), Pt(Array(0f, 1f), -1))),
    ("p3_bounded", 0.4, Seq(
      Pt(Array(0.5f, 0f), 1), Pt(Array(-0.5f, 0f), -1))),
    ("p4_interior", 1.0, Seq(
      Pt(Array(4f, 1f), 1), Pt(Array(6f, 1f), 1),
      Pt(Array(0f, 1f), -1), Pt(Array(-2f, 1f), -1))))

  /** Solve every pinned problem; emit (problem, point_id, y, alpha,
    * is_sv, rho, dual_obj) rows. Values rounded to 6 decimals — the
    * analytic optima are exact binary fractions, so a solver that is
    * RIGHT matches them bit-for-bit and 6 decimals is pure safety
    * margin; a solver that is wrong by even one SMO step misses by
    * orders more.
    */
  def solverPin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rows = problems.flatMap { case (name, c, pts) =>
      val p = Smo.Params(c = c, eps = 1e-3, kernel = Kernel.Linear)
      val xs = pts.map(_.x).toArray
      val y = pts.map(_.y.toByte).toArray
      val (alpha, rho) = Smo.solveBinary(xs, y, p)
      // dual objective: Σα − ½ ΣΣ αi αj yi yj K(xi, xj)
      var quad = 0.0
      for (i <- xs.indices; j <- xs.indices)
        quad += alpha(i) * alpha(j) * y(i) * y(j) * Kernel.Linear(xs(i), xs(j))
      val obj = alpha.sum - 0.5 * quad
      def r6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6
      pts.indices.map { i =>
        (name, i, pts(i).y, r6(alpha(i)), alpha(i) > 0, r6(rho), r6(obj))
      }
    }
    rows.toDF("problem", "point_id", "y", "alpha", "is_sv", "rho", "dual_obj")
      .orderBy("problem", "point_id")
  }
}
