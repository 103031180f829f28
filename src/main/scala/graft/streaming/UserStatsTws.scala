package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Per-user running stats on the Spark 4 `transformWithState` API
  * (SURVEY.md §2d, round-13 verdict #4) — the PRODUCTION arbitrary-
  * state surface next to [[EventStream.runningUserStats]]'s legacy
  * `flatMapGroupsWithState`: typed named state variables obtained
  * from a handle at init time, and state TTL as a first-class config
  * instead of hand-rolled timeout plumbing.
  *
  * Why TTL is the headline: `runningUserStats` keeps one state row
  * per user FOREVER (GroupStateTimeout.NoTimeout) — on an unbounded
  * key domain (user ids at 100 TB) the state store grows without
  * bound, exactly the hand-wave its scaladoc admits. `TTLConfig`
  * bounds the store by recency: a user idle past the TTL is evicted
  * by the store itself (no timer bookkeeping), and a later event
  * restarts that user's counters from zero — the eviction is
  * OBSERVABLE (the spec's witness) rather than an internal detail.
  *
  * Semantics contract: with a TTL longer than the run, the final
  * per-user state must equal both the legacy operator's and the plain
  * batch aggregate — the oracle row `stream_user_stats_tws` pins that
  * (same SQL text as `stream_user_stats`). The state store must be
  * RocksDB (transformWithState's only supported provider) — the
  * runner sets it per-query and restores the session conf after.
  */
object UserStatsTws {

  /** The typed processor: one ValueState[(n, sum, last)] per user,
    * folded per micro-batch, one Update-mode emission per active user
    * — semantically identical to the legacy fold in
    * [[EventStream.runningUserStats]] (same rounding rule, same
    * max-ts), expressed on the new API.
    */
  private final class Processor(ttl: java.time.Duration)
    extends StatefulProcessor[Long, (Long, Double, Long), (Long, Long, Double, Long)] {

    @transient private var state: ValueState[(Long, Double, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double, Long)](
        "userStats", Encoders.product[(Long, Double, Long)], TTLConfig(ttl))

    override def handleInputRows(user: Long,
                                 rows: Iterator[(Long, Double, Long)],
                                 timerValues: TimerValues): Iterator[(Long, Long, Double, Long)] = {
      var (n, sum, last) = if (state.exists()) state.get() else (0L, 0.0, 0L)
      rows.foreach { case (_, v, t) =>
        n += 1; sum += v; if (t > last) last = t
      }
      state.update((n, sum, last))
      // floor(x*100 + 0.5)/100 — the repo-wide half-away rounding rule
      // (see runningUserStats); rint would round half-even and break
      // the shared oracle on an exactly representable .xx5 sum
      Iterator.single((user, n, math.floor(sum * 100 + 0.5) / 100, last))
    }
  }

  /** The transformWithState pipeline over any (user_id, value, ts)
    * event Dataset. TimeMode.ProcessingTime is required for TTL.
    */
  def runningUserStats(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       ttl: java.time.Duration): DataFrame = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("double"),
        col("ts").cast("long")).as[(Long, Double, Long)]
      .groupByKey(_._1)
      .transformWithState(new Processor(ttl), TimeMode.ProcessingTime(),
        OutputMode.Update())
      .toDF("user_id", "n_events", "total_value", "last_seen")
  }

  /** Data-bounded shutdown for a TWS query. Under TimeMode
    * .ProcessingTime the operator reports "another batch needed"
    * FOREVER (the state-TTL/timer sweep), so both Trigger.AvailableNow
    * and processAllAvailable() run empty micro-batches without end
    * (observed: 5,700+ offsets, ~6/sec, before this was caught). The
    * only data-bounded signal is the progress log: once at least one
    * progress carried input rows and several consecutive progresses
    * carry none, every feed file is processed and the remaining
    * batches are pure timer sweeps — stop the query there.
    */
  private def drainAndStop(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val deadlineNs = System.nanoTime() + 180L * 1000 * 1000 * 1000
    try {
      var sawData = false
      var idle = 0
      // Count a progress object once: lastProgress can return the SAME
      // batch across several 200 ms polls, which would tally one empty
      // timer-sweep batch as three and stop before a pending feed file
      // is read. Only a batchId ADVANCE counts toward the idle quorum.
      var prevBatchId = -1L
      while (idle < 3) {
        // a dead query never progresses — surface ITS failure now
        // rather than burning the deadline and blaming the feed
        q.exception.foreach(e => throw e)
        if (!q.isActive)
          throw new IllegalStateException(
            "graft-tws: query terminated before the feed drained")
        if (System.nanoTime() > deadlineNs)
          throw new IllegalStateException(
            "graft-tws: stream did not drain within 180s — feed stuck?")
        // 50 ms: lastProgress polling is driver-local (no Spark job),
        // and each of the ~4 required batchId advances would otherwise
        // pay up to 200 ms detection latency
        Thread.sleep(50)
        val p = q.lastProgress
        if (p != null && p.batchId != prevBatchId) {
          prevBatchId = p.batchId
          if (p.numInputRows > 0) { sawData = true; idle = 0 }
          else if (sawData) idle += 1
        }
      }
    } finally q.stop()
  }

  /** Run `body` with the RocksDB state store provider set (the only
    * provider transformWithState supports), restoring the previous
    * session value after — other streaming gates in the same session
    * keep their default provider.
    */
  private[streaming] def withRocksDb[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Bounded gate run (the `stream_user_stats_tws` registry row): TTL
    * of one hour — far longer than the run, so no eviction fires and
    * the final state must equal the batch aggregate exactly (and the
    * legacy flatMapGroupsWithState row's output — the parity spec).
    */
  def runBounded(spark: SparkSession, sfDir: String,
                 queryName: String = "graft_stream_userstats_tws"): DataFrame =
    withRocksDb(spark) {
      FileStreams.withBoundedStreamPartitions(spark, s"$sfDir/events.parquet") {
      val stream = EventStream.tsAsMicrosLong(
        EventStream.rawEventStream(spark, sfDir), "ts")
      val q = runningUserStats(stream, java.time.Duration.ofHours(1))
        .writeStream
        .outputMode(OutputMode.Update())
        .format("memory")
        .queryName(queryName)
        .start()
      drainAndStop(q) // see scaladoc: AvailableNow never terminates here
      EventStream.finalUserStats(spark.table(queryName))
      }
    }

  /** Resumable runner for the spec's TTL-EVICTION WITNESS: streams a
    * feed directory of (user_id, value, ts) parquet under a persistent
    * checkpoint with a caller-chosen (short) TTL. Run once, let the
    * TTL elapse in wall-clock time, add files, run again on the SAME
    * checkpoint: users idle across the gap have been evicted by the
    * store, so their counters RESTART from zero — visible as a final
    * n_events that counts only post-gap events, where the legacy
    * NoTimeout operator would have kept counting. Returns the RAW
    * emission log (not the max-n_events fold — after an eviction the
    * counter RESTARTS, so "final state" is the latest emission, which
    * the spec reads off the log directly).
    */
  def runResumable(spark: SparkSession, feedDir: String, ckptDir: String,
                   outDir: String, ttl: java.time.Duration): DataFrame =
    withRocksDb(spark) {
      val schema = spark.read.parquet(feedDir).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(feedDir)
      val q = runningUserStats(stream, ttl)
        .writeStream
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.write.mode("append").parquet(outDir)
          ()
        }
        .start()
      drainAndStop(q) // data-bounded: the TTL sweep never self-terminates
      spark.read.parquet(outDir)
    }
}
