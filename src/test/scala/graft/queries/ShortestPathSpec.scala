package graft.queries

import graft.SparkSpec

class ShortestPathSpec extends SparkSpec {

  test("sf0.001 distances equal the Manhattan closed form from the corner source") {
    // 1500 dense keys = a solid 15×100 grid with ONE source (k = 0):
    // the true BFS distance is row + col, and the reached set is the
    // full Manhattan diamond of radius 8.
    val got = ShortestPath.qShortestPath(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = (0L until 1500L)
      .map(k => k -> (k / 100 + k % 100))
      .filter(_._2 <= 8).toMap
    assert(got == expect,
      s"BFS must settle the exact Manhattan diamond (got ${got.size} rows, expected ${expect.size})")
  }

  test("cyclic minimum: a node on two paths settles at the shorter one, invariant to partitioning") {
    val a = ShortestPath.qShortestPath(spark, sf0001).collect().toSeq
    var b: Seq[org.apache.spark.sql.Row] = Nil
    withSQLConf("spark.sql.shuffle.partitions" -> "7") {
      b = ShortestPath.qShortestPath(spark, sf0001).collect().toSeq
    }
    assert(a == b, "hop distances are exact integers — partitioning cannot move them")
  }
}
