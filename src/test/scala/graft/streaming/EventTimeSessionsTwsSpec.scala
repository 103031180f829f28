package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Event-time-leg pins: (1) the decided-region census equals the
  * batch gap sessionization under the same cutoff; (2) the SAME feed
  * yields the IDENTICAL emission log on a second run — the
  * replay-determinism ProcessingTime timers cannot offer (their
  * firing depends on the host's wall clock; an event-time timer fires
  * when the watermark — a pure function of the data — passes it);
  * (3) sessions survive watermark advancement across micro-batches.
  */
class EventTimeSessionsTwsSpec extends SparkSpec {

  /** Batch gap-rule sessionization census over the decided region —
    * the same arithmetic as the DuckDB oracle, in Spark.
    */
  private def batchCensus(eventsDf: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] = {
    import org.apache.spark.sql.expressions.Window
    val maxUs = eventsDf.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val cutoffUs = maxUs - EventTimeSessionsTws.DelayUs -
      EventTimeSessionsTws.GuardUs - EventTimeSessionsTws.GapUs
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = eventsDf
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_s", when(col("prev_ts").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) >= EventTimeSessionsTws.GapUs, 1)
        .otherwise(0))
      .withColumn("session_seq", sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"),
        max(unix_micros(col("ts"))).as("last_us"))
    sessions.filter(col("last_us") <= lit(cutoffUs))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max("n_events").as("max_session_events"),
        round(sum("total_value"), 2).as("total_value"))
      .orderBy("user_id")
      .collect().map(_.toSeq).toSeq
  }

  test("decided-region census equals the batch gap sessionization " +
    "under the same cutoff literal") {
    val got = EventTimeSessionsTws.runBounded(spark, sf0001, "etime_parity")
      .collect().map(_.toSeq).toSeq
    val expect = batchCensus(graft.queries.Analytics.loadEvents(spark, sf0001))
    assert(got.nonEmpty, "decided region must not be empty on the 30-day feed")
    assert(got == expect,
      s"event-time session census drifted (${got.length} vs ${expect.length} rows)")
  }

  test("run-twice determinism: the same bounded feed produces a " +
    "byte-identical emission log (timers fire on the watermark, not " +
    "the wall clock)") {
    def log(name: String): Seq[Seq[Any]] =
      EventTimeSessionsTws.emissionLog(spark, sf0001, name)
        .orderBy("user_id", "first_us")
        .collect().map(_.toSeq).toSeq
    val first = log("etime_det_a")
    val second = log("etime_det_b")
    assert(first.nonEmpty, "the feed must close at least one session")
    assert(first == second,
      "two runs over the same feed must emit identical session rows — " +
        "any drift means emission depends on something besides the data")
  }

  test("watermark advancement across micro-batches closes earlier " +
    "sessions while later ones stay open until decided") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = java.nio.file.Files.createTempDirectory("graft-etime-").toString
    val feedDir = s"$base/feed"
    val events = graft.queries.Analytics.loadEvents(spark, sf0001)
      .select("user_id", "value", "ts", "event_id")
    val midUs = events.agg(
      ((min(unix_micros(col("ts"))) + max(unix_micros(col("ts")))) / 2).cast("long"))
      .head().getLong(0)
    // time-ordered two-file feed: the second half is never late
    // relative to the watermark the first half established
    events.filter(unix_micros(col("ts")) < midUs).repartition(1)
      .write.mode("overwrite").parquet(feedDir)
    events.filter(unix_micros(col("ts")) >= midUs).repartition(1)
      .write.mode("append").parquet(feedDir)
    val schema = spark.read.parquet(feedDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(feedDir)
      .withWatermark("ts", "1 hour")
    UserStatsTws.withRocksDb(spark) {
      val q = EventTimeSessionsTws.sessions(stream)
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("etime_twobatch")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val maxUs = events.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val cutoffUs = maxUs - EventTimeSessionsTws.DelayUs -
      EventTimeSessionsTws.GuardUs - EventTimeSessionsTws.GapUs
    val got = spark.table("etime_twobatch")
      .filter(col("last_us") <= lit(cutoffUs))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max("n_events").as("max_session_events"),
        round(sum("total_value"), 2).as("total_value"))
      .orderBy("user_id")
      .collect().map(_.toSeq).toSeq
    assert(got == batchCensus(events),
      "a session split across micro-batches must close ONCE with its " +
        "full event count — early emission or double emission both drift")
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(base))
  }
}
