package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class LatestByKeySpec extends SparkSpec {

  test("aggregate formulation == window formulation, row for row") {
    val agg = LatestByKey.qLatestByKey(spark, sf0001).collect().toSeq
    val ev = Analytics.loadEvents(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
    val w = Window.partitionBy("user_id")
    val win = ev
      .withColumn("rn", row_number().over(
        w.orderBy(col("ts").desc, col("event_id").desc)))
      .withColumn("n_events", count(lit(1)).over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("last_value_cents"),
        unix_micros(col("ts")).as("last_ts_us"), col("n_events"))
      .orderBy("user_id").collect().toSeq
    assert(agg == win, "max_by aggregate must equal the row_number window")
  }

  test("plan: partial aggregation, no Window and no sort over the fact") {
    val p = LatestByKey.qLatestByKey(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"the snapshot must NOT window-sort the fact:\n$p")
    assert(p.contains("partial_max_by") || p.contains("partial_maxby") ||
      "HashAggregate.*max_by".r.findFirstIn(p).isDefined,
      s"max_by must partial-aggregate map-side:\n$p")
  }

  test("ties on ts are impossible to decide wrong: the order key includes " +
    "the unique event_id (planted tie decided by higher event_id)") {
    import spark.implicits._
    val tied = Seq(
      (1L, 10L, 1000L, "a", 1.0),
      (1L, 11L, 1000L, "b", 2.0), // same ts, higher event_id wins
      (1L, 9L, 999L, "c", 3.0)
    ).toDF("user_id", "event_id", "ts_us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val winner = tied.groupBy("user_id")
      .agg(max_by(col("event_type"), struct(col("ts"), col("event_id"))).as("t"))
      .head().getString(1)
    assert(winner == "b", s"struct(ts, event_id) must break the tie, got $winner")
  }
}
