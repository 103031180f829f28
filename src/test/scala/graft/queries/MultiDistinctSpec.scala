package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultiDistinctSpec extends SparkSpec {

  test("values match independently-computed single-distinct aggregations") {
    val base = Analytics.loadEvents(spark, sf0001)
      .select(col("event_type"), col("user_id"), to_date(col("ts")).as("day"),
        (col("user_id") % 16).as("shard"))
    def one(c: String) = base.groupBy("event_type").agg(countDistinct(c).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (users, days, shards) = (one("user_id"), one("day"), one("shard"))
    val rows = MultiDistinct.qMultiDistinct(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getString(0)
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) == (users(t), days(t), shards(t)),
        s"fused distincts must equal the separate ones for $t")
    }
  }

  test("plan: ONE Expand-based pass, not a join of sub-aggregations") {
    val qe = MultiDistinct.qMultiDistinct(spark, sf0001).queryExecution
    val physical = qe.executedPlan.toString
    assert(physical.contains("Expand"),
      s"multi-distinct must rewrite through Expand:\n$physical")
    assert(!physical.contains("Join") && !physical.contains("Union"),
      s"no self-join/union of per-distinct subplans:\n$physical")
    // one scan of the events table, not one per distinct column
    assert("FileScan parquet".r.findAllIn(physical).size == 1,
      s"single pass must read events exactly once:\n$physical")
  }
}
