package graft.queries

import graft.SparkSpec

class SegmentOverlapSpec extends SparkSpec {

  private def brute(): Map[(String, String), (Long, Long, Long, Long)] = {
    val d = Analytics.loadEvents(spark, sf0001)
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val byType = d.groupBy(_._1).map { case (t, s) => t -> s.map(_._2) }
    val types = byType.keySet.toSeq.sorted
    (for {
      a <- types; b <- types if a < b
      na = byType(a).size.toLong
      nb = byType(b).size.toLong
      both = (byType(a) intersect byType(b)).size.toLong
    } yield (a, b) -> (na, nb, both, 10000L * both / (na + nb - both))).toMap
  }

  test("pairwise intersections equal the exact set replay") {
    val out = SegmentOverlap.qSegmentOverlap(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val expected = brute()
    assert(out == expected, "bitmap AND must equal exact set intersection")
    assert(out.size == expected.size && out.nonEmpty, "all unordered pairs present")
    out.foreach { case ((a, b), (na, nb, both, _)) =>
      assert(both <= math.min(na, nb), s"($a,$b): intersection exceeds a side")
    }
  }

  test("plan: the corpus aggregation runs ONCE — exchange reuse on the self-join") {
    val df = SegmentOverlap.qSegmentOverlap(spark, sf0001)
    df.collect() // AQE decides reuse at runtime — inspect the FINAL plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("reused"),
      s"self-join branches must reuse the one bitmap aggregation:\n$p")
  }
}
