package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IslandsSpec extends SparkSpec {

  test("islands equal a driver-side consecutive-run scan") {
    val days = Analytics.loadEvents(spark, sf0001)
      .select(col("user_id"), call_function("div", unix_micros(col("ts")), lit(86400000000L)).as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = days.groupBy(_._1).map { case (u, xs) =>
      val ds = xs.map(_._2).sorted
      val runs = ds.foldLeft(List.empty[List[Long]]) {
        case (acc @ (run @ (last :: _)) :: rest, d) if d == last + 1 => (d :: run) :: rest
        case (acc, d) => List(d) :: acc
      }
      (u, runs.length.toLong, runs.map(_.length).max.toLong,
        ds.length.toLong, ds.min)
    }.toSeq.sortBy(_._1)
    val got = Islands.qIslands(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect, "grouping-by-difference must find exactly the maximal runs")
    // the corpus must actually contain gaps, or the test is vacuous
    assert(got.exists(_._2 > 1), "some user must have more than one island")
  }
}
