package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Timer-leg pins for the transformWithState surface: the bounded
  * census equals the batch aggregate (timers decide WHEN, never WHAT),
  * exactly one closed session per user, and activity RE-ARMS the
  * timer — two feed batches inside the timeout close as ONE session
  * spanning both, not two.
  */
class InactivityTwsSpec extends SparkSpec {

  test("every session closes once and the census equals the batch " +
    "aggregate (count, rounded sum, time span)") {
    val got = InactivityTws.runBounded(spark, sf0001, "inact_parity").collect()
    val users = got.map(_.getLong(0))
    assert(users.nonEmpty && users.distinct.length == users.length,
      "exactly one closed session per user")
    val expect = graft.queries.Analytics.loadEvents(spark, sf0001)
      .groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        (floor(sum("value") * 100 + 0.5) / 100).as("total_value"),
        (unix_micros(max("ts")) - unix_micros(min("ts"))).as("span_us"))
      .orderBy("user_id").collect()
    assert(got.map(_.toSeq).toSeq == expect.map(_.toSeq).toSeq,
      s"timer census drifted from the batch aggregate " +
        s"(${got.length} vs ${expect.length} rows)")
  }

  test("activity re-arms the inactivity timer: two feed files processed " +
    "back-to-back close as ONE session spanning both") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = java.nio.file.Files.createTempDirectory("graft-inact-").toString
    val feedDir = s"$base/feed"
    val events = graft.queries.Analytics.loadEvents(spark, sf0001)
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("ts"))
    val half1 = events.filter(col("ts") % 2 === 0)
    val half2 = events.filter(col("ts") % 2 === 1)
    half1.repartition(1).write.mode("overwrite").parquet(feedDir)
    half2.repartition(1).write.mode("append").parquet(feedDir)

    val schema = spark.read.parquet(feedDir).schema
    // maxFilesPerTrigger=1 → two data batches, normally milliseconds
    // apart; the 15 s timeout gives two orders of magnitude of margin
    // over a loaded host's batch gap (wall cost only accrues AFTER the
    // last batch), so batch 2 must RE-ARM every timer batch 1 set — a
    // non-re-arming processor splits each user's session in two and
    // doubles the row count
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(feedDir)
    val expected = events.select("user_id").distinct().count()
    UserStatsTws.withRocksDb(spark) {
      val q = InactivityTws.closedSessions(stream, timeoutMs = 15000L)
        .writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("inact_rearm").start()
      try {
        InactivityTws.awaitSessions(spark, q, "inact_rearm", expected,
          timeoutSec = 120)
        // give any (wrong) second emission a chance to appear
        Thread.sleep(1000)
        val rows = spark.table("inact_rearm").collect()
        assert(rows.length == expected,
          s"${rows.length} sessions for $expected users — a split session " +
            "means activity did not re-arm the timer")
        // and each session covers BOTH halves: count = full per-user count
        val expectCounts = events.groupBy("user_id").count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        rows.foreach { r =>
          assert(r.getLong(1) == expectCounts(r.getLong(0)),
            s"user ${r.getLong(0)}: session count ${r.getLong(1)} != " +
              s"full count ${expectCounts(r.getLong(0))}")
        }
      } finally q.stop()
    }
  }
}
