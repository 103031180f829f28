package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {

  test("refresh equals the full recompute; both split sides non-empty") {
    val (mv, batch) = IncrementalAgg.writeSnapshot(spark, sf0001)
    assert(spark.read.parquet(mv).count() > 0, "history MV must be non-empty")
    assert(spark.read.parquet(batch).count() > 0, "arriving batch must be non-empty")

    val refreshed = IncrementalAgg.refresh(spark, mv, batch)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

    val full = Analytics.loadEvents(spark, sf0001)
      .select(call_function("div", unix_micros(col("ts")), lit(86400000000L)).as("day"),
        col("event_type"), floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"), min("cents"), max("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

    assert(refreshed == full, "state merge must equal the full recompute cell-for-cell")
  }

  test("refresh plan never rescans the raw events corpus") {
    val (mv, batch) = IncrementalAgg.writeSnapshot(spark, sf0001)
    val plan = IncrementalAgg.refresh(spark, mv, batch).queryExecution.executedPlan.toString
    assert(!plan.contains("events.parquet"),
      s"refresh cost must be proportional to the drop, not history:\n$plan")
    assert(plan.contains("incragg-mv") && plan.contains("incragg-batch"),
      s"refresh must read exactly the MV states and the batch:\n$plan")
  }

  test("overlapping cells re-reduce correctly (the general merge contract)") {
    import spark.implicits._
    val mvDir = graft.util.TempDirs.forInput(sf0001, "incragg-ovl-mv")
    val batchDir = graft.util.TempDirs.forInput(sf0001, "incragg-ovl-b")
    // MV holds day 10 cell (n=2, sum=30, min=10, max=20); the batch
    // brings two more rows for the SAME cell plus a brand-new cell.
    Seq((10L, "click", 2L, 30L, 10L, 20L))
      .toDF("day", "event_type", "n", "sum_cents", "min_cents", "max_cents")
      .write.mode("overwrite").parquet(mvDir)
    Seq((10L, "click", 5L), (10L, "click", 40L), (11L, "view", 7L))
      .toDF("day", "event_type", "cents")
      .write.mode("overwrite").parquet(batchDir)
    val out = IncrementalAgg.refresh(spark, mvDir, batchDir)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out == Map(
      (10L, "click") -> ((4L, 75L, 5L, 40L)),
      (11L, "view") -> ((1L, 7L, 7L, 7L))),
      "merged states must equal recomputing over the union of rows")
  }
}
