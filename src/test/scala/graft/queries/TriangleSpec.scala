package graft.queries

import graft.SparkSpec

class TriangleSpec extends SparkSpec {

  /** Brute-force census from an explicit membership list. */
  private def brute(os: Seq[(Long, Long)], minSupport: Int = 1): (Long, Long, Long, Long) = {
    val edges = os.groupBy(_._1).values.flatMap { grp =>
      val ss = grp.map(_._2).distinct
      for (a <- ss; b <- ss if a < b) yield (a, b)
    // filter + keySet, NOT collect-to-pairs: collecting (a, b) tuples
    // out of a Map rebuilds a Map keyed by `a` and silently dedups
    }.toSeq.groupBy(identity).filter(_._2.size >= minSupport).keySet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val deg = adj.map { case (k, vs) => k -> vs.size.toLong }
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    val tris = edges.toSeq.map { case (a, b) =>
      (adj(a) & adj(b)).count(c => c > b)
    }.sum.toLong
    (os.map(_._2).distinct.size.toLong, edges.size.toLong, wedges, tris)
  }

  test("q_triangle census matches brute force on sf0.001 lineitem (support 5)") {
    val os = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (nv, ne, nw, nt) = brute(os, minSupport = 5)
    val r = Triangle.qTriangle(spark, sf0001).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == (nv, ne, nw, nt))
    assert(nt > 0, "test graph must actually contain triangles")
    val closure = r.getDouble(4)
    assert(closure > 0 && closure <= 1.0)
  }

  test("hub graph: orientation counts each triangle exactly once, no hub wedge blowup") {
    import spark.implicits._
    // hub 0 pairs with spokes 1..8 (one order per pair); spokes 1-2-3
    // also pair among themselves. Triangles: {1,2,3} plus the three
    // hub closures {0,1,2} {0,1,3} {0,2,3} = 4. The hub has degree 8 —
    // unoriented wedge enumeration at it would visit 28 wedges, while
    // orientation generates wedges only below the (deg,id) order.
    val os: Seq[(Long, Long)] =
      (1L to 8L).map(s => (100L + s, 0L) -> (100L + s, s)).flatMap(t => Seq(t._1, t._2)) ++
        Seq((201L, 1L), (201L, 2L), (202L, 2L), (202L, 3L), (203L, 1L), (203L, 3L))
    val (nv, ne, nw, nt) = brute(os)
    assert(nt == 4L)
    val r = Triangle.censusFromOrders(os.toDF("o", "s")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == (nv, ne, nw, nt))
  }

  test("triangle-free bipartite graph reports zero with wedges intact") {
    import spark.implicits._
    // orders each pairing one left {1,2} with one right {11,12}: C4 cycle
    val os = Seq((1L, 1L), (1L, 11L), (2L, 1L), (2L, 12L),
      (3L, 2L), (3L, 11L), (4L, 2L), (4L, 12L)).toDF("o", "s")
    val r = Triangle.censusFromOrders(os).collect()(0)
    assert(r.getLong(3) == 0L)
    assert(r.getLong(2) == 4L, "C4 has 4 wedges")
    assert(r.getDouble(4) == 0.0)
  }
}
