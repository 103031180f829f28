package graft.svm

import graft.SparkSpec

class GridSearchSpec extends SparkSpec {

  test("CV grid: full sweep, unique lexicographic argmin, discriminating cells") {
    val rows = GridSearch.gridSearch(spark, sf0001).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.length == 9)
    // every fold of every cell evaluated: n_test always the full sample
    assert(rows.forall(_._3 == 300L))
    // exactly one best, and it IS the (errors, c, gamma) lexicographic min
    val best = rows.filter(_._5)
    assert(best.length == 1)
    val expected = rows.minBy(r => (r._4, r._1, r._2))
    assert(best.head == expected)
    // the sweep discriminates: the near-constant-kernel cells underfit
    // massively while the winner is near-clean
    assert(rows.filter(_._2 == 0.001).forall(_._4 > 50))
    assert(best.head._4 < 10)
  }

  test("the table is sf-independent (model selection sample is fixed)") {
    val a = GridSearch.gridSearch(spark, sf0001).collect().map(_.toSeq)
    val b = GridSearch.gridSearch(spark, sf001).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
