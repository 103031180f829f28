package graft.streaming

import graft.SparkSpec
import graft.queries.Analytics

class StreamingSpec extends SparkSpec {

  test("bounded streaming aggregation converges to the batch result") {
    val streamed = EventStream.runBounded(spark, sf0001, queryName = "spec_stream")
      .collect().map(_.toSeq).toSet
    val batch = Analytics.qStreamAggBatch(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch, "stream/batch parity must hold on bounded input")
  }

  test("session_window sessionization reconciles with event totals") {
    val events = Analytics.loadEvents(spark, sf0001)
    val sessions = EventStream.sessionize(events).collect()
    assert(sessions.nonEmpty)
    val sessionEvents = sessions.map(_.getAs[Long]("n_events")).sum
    assert(sessionEvents == events.count(), "every event lands in exactly one session")
    val users = EventStream.sessionizeBatch(spark, sf0001).collect()
    assert(users.map(_.getAs[Long]("n_sessions")).sum == sessions.length)
  }

  test("sessionization runs as a genuine stream with watermarked session state") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = java.nio.file.Paths.get(s"$sf0001/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-stream-")
    java.nio.file.Files.createSymbolicLink(dir.resolve("events.parquet"), src)
    val schema = spark.read.parquet(src.toString).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
    val q = EventStream.sessionize(stream)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("spec_sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("spec_sessions").collect()
    // Append mode only emits sessions finalized by the watermark; the
    // bounded run must emit a subset of the batch sessions, key-equal.
    val batchKeys = EventStream.sessionize(Analytics.loadEvents(spark, sf0001))
      .select(col("user_id"), col("sw.start").as("s"), col("n_events")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("s"), r.getAs[Long]("n_events"))).toSet
    val streamKeys = streamed
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[org.apache.spark.sql.Row]("sw").getAs[java.sql.Timestamp]("start"),
        r.getAs[Long]("n_events"))).toSet
    assert(streamKeys.subsetOf(batchKeys),
      s"streamed sessions must match batch sessions; extras: ${streamKeys -- batchKeys}")
    assert(streamKeys.nonEmpty, "watermark must finalize at least the early sessions")
  }
}
