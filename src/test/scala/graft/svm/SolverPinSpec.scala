package graft.svm

import graft.SparkSpec

/** The solver must land EXACTLY on the closed-form max-margin optima —
  * see SolverPin.scala for the per-problem derivations.
  */
class SolverPinSpec extends SparkSpec {

  test("all four closed-form problems land on their analytic optima") {
    val rows = SolverPin.solverPin(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getDouble(3),
        r.getBoolean(4), r.getDouble(5), r.getDouble(6)))
    val expected = Seq(
      ("p1_sym", 0, 1, 0.5, true, 0.0, 0.5),
      ("p1_sym", 1, -1, 0.5, true, 0.0, 0.5),
      ("p2_offset", 0, 1, 0.125, true, 1.0, 0.125),
      ("p2_offset", 1, -1, 0.125, true, 1.0, 0.125),
      ("p3_bounded", 0, 1, 0.4, true, 0.0, 0.72),
      ("p3_bounded", 1, -1, 0.4, true, 0.0, 0.72),
      ("p4_interior", 0, 1, 0.125, true, 1.0, 0.125),
      ("p4_interior", 1, 1, 0.0, false, 1.0, 0.125),
      ("p4_interior", 2, -1, 0.125, true, 1.0, 0.125),
      ("p4_interior", 3, -1, 0.0, false, 1.0, 0.125))
    assert(rows.toSeq == expected)
  }

  test("the pin has teeth: a different box constraint moves the numbers") {
    // p3's α clip exactly at C — solving the same points with a wider
    // box must produce different alphas, or the bounded pin is vacuous.
    val xs = Array(Array(0.5f, 0f), Array(-0.5f, 0f))
    val y = Array(1.toByte, (-1).toByte)
    val (aTight, _) = Smo.solveBinary(xs, y, Smo.Params(c = 0.4, kernel = Kernel.Linear))
    val (aWide, _) = Smo.solveBinary(xs, y, Smo.Params(c = 10.0, kernel = Kernel.Linear))
    assert(aTight.toSeq == Seq(0.4, 0.4))
    assert(aWide.toSeq == Seq(2.0, 2.0), "wide box must reach the separable optimum α=2")
  }
}
