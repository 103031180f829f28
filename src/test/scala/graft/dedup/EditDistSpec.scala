package graft.dedup

import graft.SparkSpec

class EditDistSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("segment-partition join equals the local brute-force Levenshtein join") {
    val keys = EditDist.plantedKeys(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val expected = (for {
      (ia, ka) <- keys; (ib, kb) <- keys
      if ia < ib && lev(ka, kb) <= 1
    } yield (ia, ib, lev(ka, kb))).toSet

    val got = EditDist.editDistPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // the planted twins guarantee the contract is load-bearing: every
    // residue-7 doc must pair with its single-substitution twin
    val twinPairs = keys.collect {
      case (id, _) if id < Dedup.PlantOffset && id % 10 == 7 =>
        (id, id + 4 * Dedup.PlantOffset)
    }.toSet
    assert(twinPairs.nonEmpty)
    twinPairs.foreach { case (a, b) =>
      assert(got.exists(p => p._1 == a && p._2 == b), s"twin pair ($a,$b) missed") }
  }

  test("the join never plans a cartesian or nested-loop pair generation") {
    val p = EditDist.editDistPairs(spark, sf0001).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair generation must go through the segment equi-joins:\n$p")
  }
}
