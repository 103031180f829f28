package graft.queries

import graft.SparkSpec

class HierarchySpec extends SparkSpec {

  test("pointer-jumped closure equals the naive chase, and depth covers multiple doubling rounds") {
    val got = Hierarchy.qHierarchy(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    def chase(n: Long): (Long, Long) = {
      var (cur, d) = (n, 0L)
      while (cur >= 10) { cur /= 10; d += 1 }
      (cur, d)
    }
    got.keys.foreach { n =>
      assert(got(n) == chase(n), s"node $n: got ${got(n)} expected ${chase(n)}") }
    // sf0.01 keys reach 14999 → depth 4: the loop must have taken more
    // than one jump round (2^1 < 4), i.e. the doubling actually chained
    assert(got.values.map(_._2).max >= 4, "corpus must exercise multi-round doubling")
    assert(got.size == 15000)
  }
}
