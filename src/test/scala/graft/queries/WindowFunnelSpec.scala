package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WindowFunnelSpec extends SparkSpec {

  private val W = 48L * 3600 * 1000000 // 48h in micros

  private def brute(): Map[Long, (Long, Long, Long)] = {
    val ev = Analytics.loadEvents(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    ev.groupBy(_._1).flatMap { case (u, rows) =>
      val views = rows.filter(_._3 == "view").map(_._2).sorted
      val buys = rows.filter(_._3 == "purchase").map(_._2).sorted
      // engine + oracle collapse duplicate (user, ts1) starts via the
      // groupBy(user_id, ts1) reduce — replay on DISTINCT signup ts;
      // users with zero signups never enter s1, so emit no row
      val depths = rows.filter(_._3 == "signup").map(_._2).distinct.map { ts1 =>
        val ts2 = views.find(t => t > ts1 && t <= ts1 + W)
        val ts3 = ts2.flatMap(t2 => buys.find(t => t > t2 && t <= ts1 + W))
        1 + (if (ts2.isDefined) 1 else 0) + (if (ts3.isDefined) 1 else 0)
      }
      if (depths.isEmpty) None
      else Some(u -> (depths.size.toLong, depths.max.toLong, depths.count(_ == 3).toLong))
    }
  }

  test("per-user funnel depths equal the driver-side greedy replay") {
    val out = WindowFunnel.qWindowFunnel(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val expected = brute()
    assert(out == expected, "operator must equal the greedy per-start replay")
    // the window must bind at test SF: some starts convert, some don't
    val depths = out.values.map(_._2).toSet
    assert(depths.contains(3L), "no start ever completed the funnel")
    assert(out.values.exists(t => t._3 < t._1), "every start completed — window never binds")
  }

  test("plan: both range joins stay equi on user_id — no nested loop / cartesian") {
    val p = WindowFunnel.qWindowFunnel(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range predicates must ride the user_id equi-join:\n$p")
  }
}
