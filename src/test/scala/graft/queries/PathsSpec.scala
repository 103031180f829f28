package graft.queries

import graft.SparkSpec

class PathsSpec extends SparkSpec {

  test("top trigram paths match a brute-force count on sf0.001") {
    val ev = Analytics.loadEvents(spark, sf0001)
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS t", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).values.flatMap { grp =>
      grp.sortBy(e => (e._3, e._4)).map(_._2).sliding(3).filter(_.length == 3)
        .map(s => (s(0), s(1), s(2)))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(15)
    val got = Paths.qPaths(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3))).toSeq
    assert(got == expected)
    assert(got.head._2 >= got.last._2 && got.nonEmpty)
  }

  test("both lags ride one window exchange; the cut is TakeOrdered, not a full sort") {
    val plan = Paths.qPaths(spark, sf001).queryExecution.executedPlan.toString
    assert(plan.split("Window \\[").length == 2, "exactly one Window operator for both lags")
    assert(plan.contains("TakeOrderedAndProject"), "top-k must not be a global sort")
  }
}
