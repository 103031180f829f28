package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, Trigger, TTLConfig}

/** Per-user event-type census on `transformWithState` MAP STATE
  * (SURVEY.md §2d row 34d4) — the last state-variable kind of the
  * Spark 4 arbitrary-state API after ValueState+TTL ([[UserStatsTws]])
  * and ListState+timers ([[InactivityTws]]): a typed per-key
  * `MapState[event_type → count]`, the shape the legacy API forced
  * into one serialized blob per user (read-modify-write the WHOLE map
  * every batch). MapState reads and writes individual entries in the
  * store — per-batch work proportional to the types a user actually
  * touched, not their full history.
  *
  * Under TimeMode.None (no timers, no TTL) the operator does NOT
  * request extra batches, so — unlike the other two TWS rows —
  * Trigger.AvailableNow terminates normally and the runner needs no
  * drain loop: a deliberate three-way contrast the scaladocs of the
  * trio document.
  *
  * Oracle contract (`stream_type_census_tws`): the final emissions
  * must equal the batch `GROUP BY user_id, event_type` census exactly
  * — counters only grow, so max-per-(user, type) over the Update-mode
  * emission log is the final state.
  */
object TypeCensusTws {

  private final class Processor
    extends StatefulProcessor[Long, (Long, String), (Long, String, Long)] {

    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "typeCounts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(user: Long,
                                 rows: Iterator[(Long, String)],
                                 timerValues: TimerValues): Iterator[(Long, String, Long)] = {
      // fold the batch locally, then touch ONLY the map entries this
      // batch changed — the point of MapState over a value-blob
      val delta = scala.collection.mutable.Map.empty[String, Long]
      rows.foreach { case (_, t) => delta(t) = delta.getOrElse(t, 0L) + 1 }
      // Materialize emissions EAGERLY while the implicit grouping key
      // is still set: a lazy iterator would call the state handle
      // during downstream consumption, after this method returns.
      val out = delta.iterator.map { case (t, d) =>
        val prev = if (counts.containsKey(t)) counts.getValue(t) else 0L
        val total = prev + d
        counts.updateValue(t, total)
        (user, t, total)
      }.toList
      out.iterator
    }
  }

  /** The pipeline over any (user_id, event_type) event Dataset. */
  def typeCensus(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): DataFrame = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").cast("long"), col("event_type").cast("string"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "event_type", "n")
  }

  /** Bounded gate run: AvailableNow TERMINATES under TimeMode.None
    * (no timer sweep — see the scaladoc contrast), so this runner is
    * the plain awaitTermination shape the legacy rows use. Final state
    * per (user, type) = the max emitted counter.
    */
  def runBounded(spark: SparkSession, sfDir: String,
                 queryName: String = "graft_stream_typecensus_tws"): DataFrame =
    UserStatsTws.withRocksDb(spark) {
      FileStreams.withBoundedStreamPartitions(spark, s"$sfDir/events.parquet") {
      val stream = EventStream.rawEventStream(spark, sfDir)
      val q = typeCensus(stream)
        .writeStream
        .outputMode(OutputMode.Update())
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(queryName)
        .groupBy("user_id", "event_type")
        .agg(max(col("n")).as("n"))
        .orderBy("user_id", "event_type")
      }
    }
}
