package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSpec {

  test("conservation: both models distribute exactly the attributed purchase cents") {
    val rows = Attribution.qAttribution(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSet == Set("view", "click"))

    // total purchase cents with >=1 touch in the lookback — recomputed directly
    val ev = Analytics.loadEvents(spark, sf001).withColumn("t", unix_micros(col("ts")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t").as("tp"), col("event_id").as("pid"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val tch = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("t").as("tt"))
    val attributed = p.join(tch, Seq("user_id"))
      .filter(col("tt") <= col("tp") && col("tp") - col("tt") <= expr("7L * 86400000000L"))
      .select("pid", "cents").distinct()
      .agg(sum("cents")).collect()(0).getLong(0)

    // EXACT conservation — the integer remainder rule leaves no cent behind
    assert(rows.map(_._4).sum == attributed, "last-touch must distribute every attributed cent")
    assert(rows.map(_._5).sum == attributed, "linear must distribute every attributed cent")
    assert(rows.map(_._3).sum > rows.map(_._2).sum, "multi-touch purchases exist")
  }

  test("hand-built case: remainder to earliest, last-touch to latest") {
    import spark.implicits._
    // one purchase of 101 cents with three touches: linear = 33/33/33
    // with the remainder 2 to the EARLIEST touch (35), last-touch all
    // 101 to the latest. Channels: earliest=view, middle=click, latest=view.
    val ev = Seq(
      (1L, 10L, "view", 0.0),
      (2L, 20L, "click", 0.0),
      (3L, 30L, "view", 0.0),
      (4L, 40L, "purchase", 1.01)
    ).toDF("event_id", "tmin", "event_type", "value")
      .select(col("event_id"), lit(7L).as("user_id"), col("event_type"), col("value"),
        timestamp_micros(col("tmin") * 60000000L).as("ts"))
    // route through a temp dir so the operator's loader runs unchanged
    val dir = java.nio.file.Files.createTempDirectory("graft-attr-").toString
    ev.select("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Attribution.qAttribution(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got("view") == ((101L, 33L + 33L + 2L)), "latest view takes LT; earliest view takes remainder")
    assert(got("click") == ((0L, 33L)))
  }
}
