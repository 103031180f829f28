package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WatermarkDedupSpec extends SparkSpec {

  test("census: in-batch dups dropped, below-watermark replays dropped, " +
    "past-eviction re-emissions re-admitted") {
    val out = WatermarkDedup.runDedupWatermarkBounded(spark, sf0001, "wmdedup_census")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val a = ev.filter(col("ts") < lit("2024-01-16").cast("timestamp"))
    val b = ev.filter(col("ts") >= lit("2024-01-16").cast("timestamp"))
    val readmitted = a.filter(col("event_id") % 7 === 0 &&
      col("ts") < lit("2024-01-10").cast("timestamp"))
    val expected = a.unionByName(b).unionByName(readmitted)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == expected,
      s"admitted census must equal the closed-form replay: $out vs $expected")
    assert(!spark.catalog.tableExists("wmdedup_census"),
      "admitted events must go to the file sink, not a driver memory sink")
    // the re-admissions are the eviction witness — they must be non-zero,
    // else the test proves nothing about bounded state
    assert(readmitted.count() > 0, "plant must produce past-eviction re-emissions")
  }

  test("state is bounded: end-of-run state rows ≪ admitted keys, and the " +
    "below-watermark replays are counted dropped") {
    val (q, _, outDir) = WatermarkDedup.startQuery(spark, sf0001, "wmdedup_metrics")
    q.awaitTermination()
    val admitted = spark.read.parquet(outDir).count()
    val progresses = q.recentProgress.filter(_.stateOperators.nonEmpty)
    assert(progresses.nonEmpty, "stateful progress metrics must exist")
    val lastState = progresses.last.stateOperators.head
    assert(lastState.numRowsTotal < admitted / 10,
      s"state rows (${lastState.numRowsTotal}) must be a small fraction of " +
        s"admitted keys ($admitted) — eviction is the point")
    val droppedLate = progresses.map(_.stateOperators.head.numRowsDroppedByWatermark).sum
    assert(droppedLate > 0,
      "the same-ts replays arrive below the watermark and must be dropped there")
  }

  test("batch boundaries are what the semantics assume: exactly three " +
    "micro-batches, watermark advances between them") {
    val (q, _, _) = WatermarkDedup.startQuery(spark, sf0001, "wmdedup_batches")
    q.awaitTermination()
    val withRows = q.recentProgress.filter(_.numInputRows > 0)
    assert(withRows.length == 3,
      s"one file per trigger over three files = three batches, got ${withRows.length}")
    val wm1 = withRows.head.eventTime.get("watermark")
    val wm2 = withRows.last.eventTime.get("watermark")
    assert(wm2 != null && (wm1 == null || wm2.compareTo(wm1) > 0),
      s"watermark must advance across batches ($wm1 -> $wm2)")
  }
}
