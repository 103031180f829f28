package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Inactivity-closed sessions on `transformWithState` TIMERS
  * (SURVEY.md §2d row 34d3) — the third leg of the Spark 4 arbitrary-
  * state API after [[UserStatsTws]]'s typed ValueState + TTL: per-key
  * PROCESSING-TIME TIMERS with `handleExpiredTimer`, plus `ListState`
  * (the per-key append log the legacy API forced into one serialized
  * blob). Each user's events append to a ListState and re-arm a
  * single inactivity timer; when the timer expires — no activity for
  * `timeoutMs` — the session closes and ONE row (count, rounded value
  * sum, time span) is emitted from the expired-timer callback, and
  * the state clears.
  *
  * The oracle contract exploits that timers decide only WHEN rows
  * emit, never WHAT: with a bounded feed every session eventually
  * goes inactive, so the emitted census must equal the plain batch
  * aggregate row-for-row (`stream_inactivity_tws` — same discipline
  * as the 34d rows). The runner waits for |users| emissions (the
  * timer-sweep batches that made AvailableNow unusable for
  * [[UserStatsTws]] are exactly what FIRES the timers here).
  *
  * At 100 TB: state is one timer + one (list, sum) pair per ACTIVE
  * key in the store — inactive keys emit and clear, so state tracks
  * concurrent activity, not history; emissions shuffle only the
  * closed-session rows.
  */
object InactivityTws {

  private final class Processor(timeoutMs: Long)
    extends StatefulProcessor[Long, (Long, Double, Long), (Long, Long, Double, Long)] {

    @transient private var tsLog: ListState[Long] = _
    @transient private var valSum: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      tsLog = getHandle.getListState[Long]("tsLog", Encoders.scalaLong, TTLConfig.NONE)
      valSum = getHandle.getValueState[Double]("valSum", Encoders.scalaDouble, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long,
                                 rows: Iterator[(Long, Double, Long)],
                                 timerValues: TimerValues): Iterator[(Long, Long, Double, Long)] = {
      var sum = if (valSum.exists()) valSum.get() else 0.0
      rows.foreach { case (_, v, t) => tsLog.appendValue(t); sum += v }
      valSum.update(sum)
      // activity re-arms the single inactivity timer: drop any armed
      // timer for this key, then schedule timeout from NOW
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs + timeoutMs)
      Iterator.empty
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Double, Long)] = {
      val ts = tsLog.get().toArray
      val sum = if (valSum.exists()) valSum.get() else 0.0
      tsLog.clear(); valSum.clear()
      if (ts.isEmpty) Iterator.empty // replayed/raced timer: nothing to close
      else Iterator.single((user, ts.length.toLong,
        // repo-wide half-away rounding (see UserStatsTws.Processor)
        math.floor(sum * 100 + 0.5) / 100, ts.max - ts.min))
    }
  }

  /** The pipeline over any (user_id, value, ts) event Dataset. */
  def closedSessions(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                     timeoutMs: Long): DataFrame = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("double"),
        col("ts").cast("long")).as[(Long, Double, Long)]
      .groupByKey(_._1)
      .transformWithState(new Processor(timeoutMs), TimeMode.ProcessingTime(),
        OutputMode.Update())
      .toDF("user_id", "n_events", "total_value", "span_us")
  }

  /** Bounded gate run (`stream_inactivity_tws`): feed the whole event
    * table (one file → one data batch, so each user's events land in
    * one handleInputRows call and arm exactly one timer), then wait
    * until every session has CLOSED — |distinct users| emissions —
    * and stop. Every session closes because no further data arrives,
    * so the census equals the batch aggregate exactly.
    */
  def runBounded(spark: SparkSession, sfDir: String,
                 queryName: String = "graft_stream_inactivity_tws",
                 // 500 ms, down from 2000 (round-14): the gate feed is ONE
                 // file = ONE data batch, so every user's events are folded
                 // and its single timer armed before any timer can fire —
                 // the timeout is pure emission latency here, never a
                 // session boundary. The re-arm semantics keep their own
                 // multi-batch spec feeds (InactivityTwsSpec).
                 timeoutMs: Long = 500L): DataFrame = {
    val stream = EventStream.tsAsMicrosLong(
      EventStream.rawEventStream(spark, sfDir), "ts")
    val expected = graft.queries.Analytics.loadEvents(spark, sfDir)
      .select("user_id").distinct().count()
    UserStatsTws.withRocksDb(spark) {
     FileStreams.withBoundedStreamPartitions(spark, s"$sfDir/events.parquet") {
      val q = closedSessions(stream, timeoutMs)
        .writeStream
        .outputMode(OutputMode.Update())
        .format("memory")
        .queryName(queryName)
        .start()
      try awaitSessions(spark, q, queryName, expected, timeoutSec = 180)
      finally q.stop()
      spark.table(queryName).orderBy("user_id")
     }
    }
  }

  /** Poll the memory sink until `expected` sessions have emitted —
    * failing fast on a dead query (its own exception, or a clean
    * termination before the count is reached) rather than burning the
    * deadline. Shared by the gate runner and the re-arm spec.
    */
  private[streaming] def awaitSessions(spark: SparkSession,
                                       q: org.apache.spark.sql.streaming.StreamingQuery,
                                       tableName: String, expected: Long,
                                       timeoutSec: Long): Unit = {
    val deadlineNs = System.nanoTime() + timeoutSec * 1000 * 1000 * 1000
    while (spark.table(tableName).count() < expected) {
      q.exception.foreach(e => throw e)
      if (!q.isActive) throw new IllegalStateException(
        "graft-tws-timers: query terminated before all sessions closed")
      if (System.nanoTime() > deadlineNs) throw new IllegalStateException(
        s"graft-tws-timers: ${spark.table(tableName).count()} of $expected " +
          s"sessions closed within ${timeoutSec}s — timers not firing?")
      Thread.sleep(200)
    }
  }
}
