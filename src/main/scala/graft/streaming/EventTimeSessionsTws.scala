package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, Trigger, TTLConfig}

/** Gap sessions closed by EVENT-TIME timers on `transformWithState`
  * (SURVEY.md §2d row 34d5) — the fourth TWS row, and the one that
  * fixes what the other three cannot: under TimeMode.ProcessingTime a
  * timer fires when the HOST's wall clock passes it, so emission
  * timing depends on machine speed and the gate needed a data-bounded
  * drain loop ([[UserStatsTws]] scaladoc). Under TimeMode.EventTime a
  * timer fires when the WATERMARK — a pure function of the data —
  * passes it, so the same bounded feed produces the same emission log
  * on every run and every machine: replay-deterministic
  * sessionization, the production shape.
  *
  * Mechanics per user key:
  *   - events append to a `ListState[(ts_us, value)]`;
  *   - each input batch re-derives the gap sessions (same rule as
  *     `session_window`: a gap >= 30 min STARTS a new session) over
  *     the still-open events and arms one event-time timer per
  *     session close horizon (`last_ts + gap`);
  *   - when the watermark passes a horizon, `handleExpiredTimer`
  *     emits every session whose close horizon the watermark cleared
  *     — (n_events, rounded value sum, first/last ts) — and removes
  *     exactly those events from state. Open sessions stay, their
  *     timers stay armed.
  * State is therefore bounded by UNDECIDED events only (the sliding
  * lateness+gap horizon at 100 TB), never history; emissions shuffle
  * only closed-session rows.
  *
  * AvailableNow termination contrast (the trio's scaladoc theme):
  * EventTime requests a batch only while the watermark can still
  * advance, so the bounded run terminates by itself — no drain loop,
  * unlike ProcessingTime ([[UserStatsTws]]/[[InactivityTws]]), same
  * as TimeMode.None ([[TypeCensusTws]]).
  *
  * Oracle contract (`stream_sessions_etime`): timers decide only WHEN
  * a session emits, never WHAT — so over the bounded feed the
  * emission log, restricted to the watermark-DECIDED region (sessions
  * whose close horizon lies a guard second before the final watermark
  * `max(ts) - delay`), must equal the batch lag-rule sessionization
  * under the SAME cutoff literal — the `stream_sessionize` census
  * with a decided-region filter ([[EventStream]] /
  * `runAttributionOuterBounded`'s discipline).
  */
object EventTimeSessionsTws {

  /** 30-min inactivity gap (µs) — the `stream_sessionize` contract. */
  val GapUs: Long = 1800L * 1000000L

  /** Watermark delay (µs): production-shaped lateness allowance; on
    * the bounded single-batch feed nothing is actually late.
    */
  val DelayUs: Long = 3600L * 1000000L

  /** Decided-region guard (µs): keeps the exact watermark boundary row
    * out of BOTH engines (ms-floor rounding of the watermark vs µs
    * event times — same reason `stream_stream_outer` guards).
    */
  val GuardUs: Long = 1000000L

  private def splitSessions(evs: Array[(Long, Double)]): Seq[Array[(Long, Double)]] = {
    if (evs.isEmpty) return Seq.empty
    val out = Seq.newBuilder[Array[(Long, Double)]]
    var start = 0
    var i = 1
    while (i < evs.length) {
      if (evs(i)._1 - evs(i - 1)._1 >= GapUs) {
        out += evs.slice(start, i); start = i
      }
      i += 1
    }
    out += evs.slice(start, evs.length)
    out.result()
  }

  private final class Processor
    extends StatefulProcessor[Long, (Long, Double, Long), (Long, Long, Double, Long, Long)] {

    @transient private var log: ListState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      log = getHandle.getListState[(Long, Double)]("events",
        Encoders.product[(Long, Double)], TTLConfig.NONE)

    // deterministic event order whatever the shuffle delivered: ties on
    // ts sort by value, so per-session double sums are bit-identical
    // across runs (the run-twice spec's requirement)
    private def sortedLog(): Array[(Long, Double)] = {
      val a = log.get().toArray
      scala.util.Sorting.stableSort(a)
      a
    }

    override def handleInputRows(user: Long,
                                 rows: Iterator[(Long, Double, Long)],
                                 timerValues: TimerValues): Iterator[(Long, Long, Double, Long, Long)] = {
      rows.foreach { case (_, v, t) => log.appendValue((t, v)) }
      // one event-time timer per open session's close horizon — per
      // SESSION, not per key: an old decided session must fire even
      // when the key's newest activity sits beyond the final watermark
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      splitSessions(sortedLog()).foreach { s =>
        getHandle.registerTimer((s.last._1 + GapUs) / 1000 + 1)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Double, Long, Long)] = {
      val wmUs = timerValues.getCurrentWatermarkInMs * 1000L
      val evs = sortedLog()
      if (evs.isEmpty) return Iterator.empty // a sibling timer already swept
      val (closed, open) = splitSessions(evs).partition(_.last._1 + GapUs <= wmUs)
      if (closed.isEmpty) return Iterator.empty
      log.clear()
      if (open.nonEmpty) open.flatten.foreach(log.appendValue)
      // open sessions' timers remain armed from handleInputRows
      closed.iterator.map { s =>
        var sum = 0.0
        s.foreach(sum += _._2)
        (user, s.length.toLong,
          // repo-wide half-away rounding (see UserStatsTws.Processor)
          math.floor(sum * 100 + 0.5) / 100, s.head._1, s.last._1)
      }
    }
  }

  /** The pipeline over a WATERMARKED event stream: `ts` must be the
    * TIMESTAMP column carrying `withWatermark` (EventTime timers
    * require one); the processor folds its micros value.
    */
  def sessions(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): DataFrame = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("double"),
        unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .transformWithState(new Processor, TimeMode.EventTime(),
        OutputMode.Append())
      .toDF("user_id", "n_events", "total_value", "first_us", "last_us")
  }

  /** Raw emission log over the bounded feed (shared by the gate census
    * and the run-twice determinism spec): AvailableNow terminates BY
    * ITSELF under EventTime — the watermark stops advancing once the
    * feed is drained, so no drain loop (see scaladoc contrast).
    */
  def emissionLog(spark: SparkSession, sfDir: String,
                  queryName: String): DataFrame =
    UserStatsTws.withRocksDb(spark) {
     FileStreams.withBoundedStreamPartitions(spark, s"$sfDir/events.parquet") {
      val stream = graft.queries.Analytics.normalizeTs(
        EventStream.rawEventStream(spark, sfDir))
        .withWatermark("ts", "1 hour")
      val q = sessions(stream)
        .writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(queryName)
     }
    }

  /** Bounded gate run (`stream_sessions_etime`): emission log →
    * decided-region census. The cutoff is computed from the batch
    * table (two longs on the driver, the `stream_stream_outer`
    * pattern) with the SAME literal arithmetic the oracle SQL uses:
    * a session is decided iff its close horizon cleared the final
    * watermark by the guard — `last_ts + gap <= max(ts) - delay -
    * guard`.
    */
  def runBounded(spark: SparkSession, sfDir: String,
                 queryName: String = "graft_stream_sessions_etime"): DataFrame = {
    val maxUs = graft.queries.Analytics.loadEvents(spark, sfDir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val cutoffUs = maxUs - DelayUs - GuardUs - GapUs
    emissionLog(spark, sfDir, queryName)
      .filter(col("last_us") <= lit(cutoffUs))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max("n_events").as("max_session_events"),
        round(sum("total_value"), 2).as("total_value"))
      .orderBy("user_id")
  }
}
