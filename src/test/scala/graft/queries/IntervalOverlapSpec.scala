package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalOverlapSpec extends SparkSpec {

  test("grid-bucketed overlap join equals the naive pairwise overlap count") {
    val gridUs = 1800000000L
    val baseUs = 1704067200000000L
    val evs = Analytics.loadEvents(spark, sf0001)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0))
      .map(s => (s, s + 1200000000L))
    val kmax = (evs.map(_._2).max - baseUs) / gridUs
    val expected = (0L to kmax).map { k =>
      val (ws, we) = (baseUs + k * gridUs, baseUs + k * gridUs + 2700000000L)
      k -> evs.count { case (s, e) => s < we && ws < e }.toLong
    }.filter(_._2 > 0).toMap

    val got = IntervalOverlap.qIntervalOverlap(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // overlapping windows: some event must hit >= 2 windows, so the
    // (k, event_id) dedup is load-bearing
    assert(expected.values.sum > evs.length,
      "the lattice must overlap enough that events hit multiple windows")
  }

  test("overlap candidates come from the grid equi-join, never a nested loop") {
    val p = IntervalOverlap.qIntervalOverlap(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"expected grid-bucketed equi-join:\n$p")
  }
}
