package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingDistinctSpec extends SparkSpec {

  test("bitmap fan-out equals a brute-force per-window distinct over raw events") {
    val raw = Analytics.loadEvents(spark, sf0001)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = raw.map(_._1).distinct
    val expect = days.map { d =>
      val week = raw.filter(e => !e._1.isBefore(d.minusDays(6)) && !e._1.isAfter(d))
      (d, raw.filter(_._1 == d).map(_._2).distinct.length.toLong,
        week.map(_._2).distinct.length.toLong)
    }.sortBy(_._1.toEpochDay).toSeq
    val got = RollingDistinct.qRollingDistinct(spark, sf0001).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, "per-day and trailing-7-day exact distinct must match brute force")
    // the window metric must actually differ from the daily one
    // somewhere, or the test proves nothing about the merge
    assert(got.exists(r => r._3 > r._2), "7d window must exceed 1d on some day")
  }
}
