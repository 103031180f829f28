package graft.similarity

import graft.SparkSpec

class IvfDeleteSpec extends SparkSpec {

  test("tombstone delete: before-reachable, after-unreachable, census-exact") {
    val rows = IvfDelete.deleteContract(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    assert(rows.map(_._1).toSeq == Seq("after", "before", "census"))
    assert(rows.forall(_._2), "plant must be non-empty at every SF")
    assert(rows.forall(_._3), s"delete contract rows must all hold: ${rows.mkString(", ")}")
  }
}
