package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Structured Streaming surface (SURVEY.md §2d): the events table as a
  * stream — watermarked tumbling-window aggregation, the canonical
  * "readStream → transform → writeStream" shape. The batch-equivalent
  * query (Analytics.qStreamAggBatch) is the oracle: on a bounded input
  * the streaming result must converge to the batch result.
  */
object EventStream {

  /** Adaptive event-time stream reader: `ts` normalization is shared
    * with the batch loader (Analytics.normalizeTs — nanos-as-long /
    * TIMESTAMP_NTZ micros / TIMESTAMP all land on identical micros
    * instants), so every bounded-parity oracle is independent of which
    * generation of test data is underneath.
    */
  private[streaming] def rawEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    FileStreams.readStream(spark, s"$sfDir/events.parquet")
  }

  /** `ts` as a micros-precision TIMESTAMP, whatever the physical type. */
  private def tsAsTimestamp(df: DataFrame): DataFrame =
    graft.queries.Analytics.normalizeTs(df)

  /** Event time as a plain micros LONG under `name` (state-fold form —
    * the custom-state operators only need ordering/arithmetic).
    */
  private[streaming] def tsAsMicrosLong(df: DataFrame, name: String): DataFrame =
    tsAsTimestamp(df).withColumn(name, unix_micros(col("ts")))

  /** Windowed aggregation over a streaming DataFrame (1h tumbling
    * windows per event_type, 2h watermark for late data).
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))

  /** Gap-based sessionization with the native `session_window` operator
    * (30-minute inactivity gap), rolled up to per-user session stats.
    * Works identically over a batch or streaming DataFrame — in
    * streaming, state is managed by the watermark instead of a window
    * shuffle, which is the scalable form of "custom session state"
    * (no flatMapGroupsWithState needed: the built-in operator already
    * expresses the semantics, and its state store is incremental).
    */
  def sessionize(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))

  /** Batch rollup of [[sessionize]] to (user, n_sessions, max session
    * size, total value) — the SQL-oracle-checkable surface.
    */
  def sessionizeBatch(spark: SparkSession, sfDir: String): DataFrame =
    sessionize(graft.queries.Analytics.loadEvents(spark, sfDir))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        max("n_events").as("max_session_events"),
        round(sum("total_value"), 2).as("total_value"))
      .orderBy("user_id")

  /** Per-user running stats via `flatMapGroupsWithState` — the custom-
    * state path for semantics no built-in aggregation expresses (here:
    * a monotone event counter + running value sum + last-seen time kept
    * per user across micro-batches). State is per-key in the state
    * store, so it scales with distinct users, not events; production
    * use adds a GroupStateTimeout to expire idle keys.
    */
  def runningUserStats(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    import events.sparkSession.implicits._
    val typed = events.select(col("user_id").cast("long"), col("value").cast("double"),
      col("ts").cast("long")).as[(Long, Double, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double, Long), (Long, Long, Double, Long)](
        OM.Update, GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[(Long, Double, Long)]) =>
          var (n, sum, last) = state.getOption.getOrElse((0L, 0.0, 0L))
          rows.foreach { case (_, v, t) =>
            n += 1; sum += v; if (t > last) last = t
          }
          state.update((n, sum, last))
          // floor(x*100 + 0.5)/100, not rint: rint rounds half-even
          // while SQL round() rounds half-away — on an exactly
          // representable .xx5 sum the two differ and the oracle
          // hash breaks; this formula is pure IEEE ops any engine
          // reproduces (same rule as Analytics.qMovingAvg)
          Iterator.single((user, n, math.floor(sum * 100 + 0.5) / 100, last))
      }
      .toDF("user_id", "n_events", "total_value", "last_seen")
  }

  /** Bounded run of [[runningUserStats]]: Update-mode emissions land in
    * the memory sink once per (micro-batch, active user); the final
    * state is the row with the largest n_events per user (the counter
    * strictly increases across a user's emissions), packed through one
    * struct-max aggregation. The batch groupBy over the same events is
    * the SQL oracle — custom state must converge to it exactly.
    */
  def runUserStatsBounded(spark: SparkSession, sfDir: String,
                          queryName: String = "graft_stream_userstats"): DataFrame =
  FileStreams.withBoundedStreamPartitions(spark, s"$sfDir/events.parquet") {
    // ts stays a plain long (micros — the external comparison
    // granularity): the state fold only needs ordering
    val stream = tsAsMicrosLong(rawEventStream(spark, sfDir), "ts")
    val q = runningUserStats(stream)
      .writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    finalUserStats(spark.table(queryName))
  }

  /** Update-mode emissions → final per-user state: the row with the
    * largest n_events per user (the counter strictly increases across a
    * user's emissions), packed through one struct-max aggregation.
    */
  private[streaming] def finalUserStats(emissions: DataFrame): DataFrame =
    emissions
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("total_value"), col("last_seen"))).as("fin"))
      .select(col("user_id"), col("fin.n_events").as("n_events"),
        col("fin.total_value").as("total_value"), col("fin.last_seen").as("last_seen"))
      .orderBy("user_id")

  /** RESTART-RECOVERY runner for [[runningUserStats]]: streams a
    * caller-controlled feed DIRECTORY of (user_id, value, ts-micros)
    * parquet under a persistent checkpoint, appending every Update-mode
    * emission to `outDir`. Calling it again after the feed dir gained
    * files resumes the SAME checkpoint — the source's offset log skips
    * already-processed files and the flatMapGroupsWithState state store
    * restores every user's running (n, sum, last), so counters CONTINUE
    * rather than restart from zero. The restart spec pins the recovered
    * final state row-equal to the all-at-once batch aggregate — the
    * property that makes a 3 a.m. driver crash at 100 TB a resume, not
    * a recount. Returns the final per-user state over all emissions so
    * far.
    */
  def runUserStatsResumable(spark: SparkSession, feedDir: String,
                            ckptDir: String, outDir: String): DataFrame = {
    val schema = spark.read.parquet(feedDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(feedDir)
    val q = runningUserStats(stream)
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.write.mode("append").parquet(outDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    finalUserStats(spark.read.parquet(outDir))
  }

  /** Streaming ordered-funnel state machine per user
    * (`flatMapGroupsWithState`): signup → view → purchase with 7-day
    * step windows, the streaming twin of
    * [[graft.queries.Funnel.qFunnel]].
    *
    * The chain is NOT incrementally foldable under out-of-order
    * arrival — a later-arriving EARLIER signup re-bases t1 and can
    * re-qualify views that were previously outside the window — so
    * the state keeps the per-user timestamp lists of the three STEP
    * types only (clicks/errors never enter state) and re-derives
    * (t1, t2, t3) after each micro-batch. State is ∝ a user's
    * step events inside the funnel horizon; production use expires
    * users via an event-time timeout once the watermark passes
    * t1 + 2 weeks — on the bounded 30-day replay nothing would
    * expire, so no timeout is registered here.
    *
    * Emissions carry a monotone per-user seen-counter; the bounded
    * runner keeps each user's final emission and aggregates to the
    * exact q_funnel output shape — which is why the oracle is
    * q_funnel's own SQL.
    */
  def funnelState(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    import events.sparkSession.implicits._
    val week = 604800000000L
    val typed = events.select(col("user_id").cast("long"),
      col("event_type").cast("string"), col("te").cast("long"))
      .as[(Long, String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[Long], Seq[Long], Seq[Long], Long), (Long, Long, Long, Long, Long)](
        OM.Update, GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[(Seq[Long], Seq[Long], Seq[Long], Long)]) =>
          var (sgn, vws, prc, seen) = state.getOption.getOrElse(
            (Seq.empty[Long], Seq.empty[Long], Seq.empty[Long], 0L))
          rows.foreach { case (_, tpe, t) =>
            tpe match {
              case "signup"   => sgn = t +: sgn
              case "view"     => vws = t +: vws
              case "purchase" => prc = t +: prc
              case _          => ()
            }
            seen += 1
          }
          state.update((sgn, vws, prc, seen))
          val t1 = if (sgn.isEmpty) -1L else sgn.min
          val t2 = if (t1 < 0) -1L else {
            val c = vws.filter(t => t > t1 && t <= t1 + week)
            if (c.isEmpty) -1L else c.min
          }
          val t3 = if (t2 < 0) -1L else {
            val c = prc.filter(t => t > t2 && t <= t2 + week)
            if (c.isEmpty) -1L else c.min
          }
          Iterator.single((user, seen, t1, t2, t3))
      }
      .toDF("user_id", "n_seen", "t1", "t2", "t3")
  }

  /** Bounded run of [[funnelState]]: final emission per user (seen is
    * monotone), then the q_funnel presentation aggregate — the
    * streaming state machine must converge to the batch chain exactly,
    * so the oracle IS q_funnel's SQL.
    */
  def runFunnelBounded(spark: SparkSession, sfDir: String,
                       queryName: String = "graft_stream_funnel"): DataFrame =
  FileStreams.withBoundedStreamPartitions(spark, s"$sfDir/events.parquet") {
    val stream = tsAsMicrosLong(rawEventStream(spark, sfDir), "te")
    val q = funnelState(stream)
      .writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val fin = spark.table(queryName)
      .groupBy("user_id")
      .agg(max(struct(col("n_seen"), col("t1"), col("t2"), col("t3"))).as("f"))
      .select(col("user_id"), col("f.t1").as("t1"), col("f.t2").as("t2"), col("f.t3").as("t3"))
    fin.agg(
      count(lit(1)).as("n_users"),
      count(when(col("t1") =!= -1L, 1)).as("u_signup"),
      count(when(col("t2") =!= -1L, 1)).as("u_view"),
      count(when(col("t3") =!= -1L, 1)).as("u_purchase"),
      min(when(col("t1") =!= -1L, col("t1"))).as("first_signup_us"),
      max(when(col("t3") =!= -1L, col("t3"))).as("last_purchase_us"))
  }

  /** Stream-static join: the event stream enriched against the (static)
    * customer dimension, rolled up per market segment. The static side
    * broadcasts — a stream-static equi-join is STATELESS (each
    * micro-batch joins independently; no watermark, no join state), so
    * it composes freely with the downstream aggregation. This is the
    * canonical "enrich the firehose against a dimension" shape; a
    * stream-STREAM join would instead carry watermarked state on both
    * sides.
    */
  def enrichJoin(events: DataFrame, customer: DataFrame): DataFrame =
    events
      .join(broadcast(customer), pmod(col("user_id"), lit(100)) === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))

  /** Bounded run of [[enrichJoin]]: stream events, static customers;
    * result must equal the batch join (the SQL oracle).
    */
  def runEnrichJoinBounded(spark: SparkSession, sfDir: String,
                           queryName: String = "graft_stream_join"): DataFrame =
  FileStreams.withBoundedStreamPartitions(spark, s"$sfDir/events.parquet") {
    // no ts conversion: the enrichment join never reads event time
    val stream = rawEventStream(spark, sfDir)
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_mktsegment")
    val q = enrichJoin(stream, customer)
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName).orderBy("c_mktsegment")
  }

  /** Watermarked STREAM-STREAM inner join — the attribution shape of a
    * clickstream pipeline: every `purchase` within one hour AFTER a
    * same-user `view`, both sides LIVE streams. Unlike [[enrichJoin]]
    * (stateless per micro-batch), this carries state on BOTH sides;
    * the two ingredients Structured Streaming needs to bound it are
    * here: a watermark on each side (2 h) and a time-RANGE join
    * condition, so views are dropped from the state store once the
    * purchase-side watermark passes `ts_v + 1 hour`, and purchases
    * once the view-side watermark passes `ts_p` — state is a sliding
    * ~3 h of events per side at any moment, independent of total
    * stream length. Without the range condition the state would grow
    * unboundedly; Spark would accept the query and die at scale.
    *
    * Inner join in Append mode emits each pair exactly when matched;
    * late rows beyond the watermark are dropped on arrival (none exist
    * on a bounded replay, which is what makes batch parity exact).
    */
  def attributionJoin(views: DataFrame, purchases: DataFrame): DataFrame =
    views
      .select(col("user_id").as("v_user"), col("ts").as("ts_v"))
      .withWatermark("ts_v", "2 hours")
      .join(
        purchases
          .select(col("user_id").as("p_user"), col("ts").as("ts_p"),
            col("value").as("p_value"))
          .withWatermark("ts_p", "2 hours"),
        expr("v_user = p_user AND ts_p >= ts_v AND ts_p <= ts_v + interval 1 hour"))

  /** Bounded run of [[attributionJoin]] (`stream_stream_join`): both
    * sides stream from the same events parquet (a self-join of the
    * firehose — each side is an independent FileStreamSource), the
    * Append-mode pair emissions land in a CHECKPOINTED parquet file
    * sink, and the rollup is a batch aggregate over the sink. The pair
    * volume is O(matched pairs) — a driver memory sink would buffer
    * all of it on one machine before aggregating, which is the part of
    * the pipeline that dies first at 100x scale; the file sink keeps
    * the write distributed and exactly-once, and the rollup shuffles
    * only (user, partial-agg) rows. The batch self-join over the same
    * bounded events is the SQL oracle.
    */
  def runAttributionBounded(spark: SparkSession, sfDir: String,
                            queryName: String = "graft_stream_ss_join"): DataFrame =
  FileStreams.withBoundedStreamPartitions(spark, s"$sfDir/events.parquet") {
    def side(tpe: String): DataFrame =
      tsAsTimestamp(rawEventStream(spark, sfDir))
        .filter(col("event_type") === tpe)
        .select("user_id", "ts", "value")
    val (outDir, ckptDir) = FileStreams.freshSinkDirs(queryName)
    val q = attributionJoin(side("view"), side("purchase"))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
      .groupBy(col("v_user").as("user_id"))
      .agg(count(lit(1)).as("n_attributed"),
        round(sum("p_value"), 2).as("attributed_value"))
      .orderBy("user_id")
  }

  /** LEFT-OUTER variant of [[attributionJoin]]: every view, matched
    * with its purchases within the hour OR null-padded if none arrive.
    * Matched pairs emit on arrival like the inner join; an UNMATCHED
    * view can only emit once the join is sure no purchase can still
    * match — i.e. when the global watermark (the MIN of both sides'
    * watermarks) passes `ts_v + 1 hour`. That makes the outer join the
    * one stream-stream shape whose output is watermark-DRIVEN, not
    * just watermark-BOUNDED: rows whose decision horizon lies beyond
    * the final watermark stay in the state store forever on a bounded
    * replay. Batch parity therefore quantifies over the DECIDED region
    * only — `ts_v < min(max view ts, max purchase ts) - 3h` (2 h
    * watermark delay + 1 h match window), strict to keep the exact
    * boundary row out of both engines.
    */
  def attributionJoinOuter(views: DataFrame, purchases: DataFrame): DataFrame =
    views
      .select(col("user_id").as("v_user"), col("ts").as("ts_v"))
      .withWatermark("ts_v", "2 hours")
      .join(
        purchases
          .select(col("user_id").as("p_user"), col("ts").as("ts_p"),
            col("value").as("p_value"))
          .withWatermark("ts_p", "2 hours"),
        expr("v_user = p_user AND ts_p >= ts_v AND ts_p <= ts_v + interval 1 hour"),
        "left_outer")

  /** Bounded run of [[attributionJoinOuter]] (`stream_stream_outer`):
    * Append-mode emissions (pairs + watermark-expired null rows) land
    * in a CHECKPOINTED parquet file sink (same production shape as
    * [[runAttributionBounded]] — the emission volume never touches the
    * driver); the batch rollup over the sink keeps only the decided
    * region and counts total view rows vs attributed ones per user, so
    * the null-padding is load-bearing — drop it and n_rows collapses
    * to n_attributed. The batch LEFT JOIN under the same cutoff is the
    * SQL oracle.
    */
  def runAttributionOuterBounded(spark: SparkSession, sfDir: String,
                                 queryName: String = "graft_stream_ss_outer"): DataFrame =
  FileStreams.withBoundedStreamPartitions(spark, s"$sfDir/events.parquet") {
    def side(tpe: String): DataFrame =
      tsAsTimestamp(rawEventStream(spark, sfDir))
        .filter(col("event_type") === tpe)
        .select("user_id", "ts", "value")
    val (outDir, ckptDir) = FileStreams.freshSinkDirs(queryName)
    val q = attributionJoinOuter(side("view"), side("purchase"))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Decided-region cutoff from a batch read of the same bounded
    // input: one tiny aggregate, driver-side by design (two longs).
    val mx = graft.queries.Analytics.loadEvents(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(max(unix_micros(col("ts"))).as("m"))
      .filter(col("event_type").isin("view", "purchase"))
      .agg(min("m")).head().getLong(0)
    val cutoffMicros = mx - 3L * 3600L * 1000000L
    spark.read.parquet(outDir)
      .filter(col("ts_v") < timestamp_micros(lit(cutoffMicros)))
      .groupBy(col("v_user").as("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("ts_p")).as("n_attributed"),
        round(sum(coalesce(col("p_value"), lit(0.0))), 2).as("attributed_value"))
      .orderBy("user_id")
  }

  /** Stream-stream FULL outer join (`stream_stream_full`) — BOTH sides
    * null-padded on watermark expiry: views that never converted emit
    * (view, null) once the watermark passes their 1 h match horizon
    * (as in [[attributionJoinOuter]]), and purchases no view ever
    * claimed emit (null, purchase) once the watermark passes their
    * event time — the second padding direction the left-outer row
    * cannot produce. Same two-sided watermark + interval condition, so
    * state on each side is bounded by its lateness window.
    */
  def attributionJoinFull(views: DataFrame, purchases: DataFrame): DataFrame =
    views
      .select(col("user_id").as("v_user"), col("ts").as("ts_v"))
      .withWatermark("ts_v", "2 hours")
      .join(
        purchases
          .select(col("user_id").as("p_user"), col("ts").as("ts_p"),
            col("value").as("p_value"))
          .withWatermark("ts_p", "2 hours"),
        expr("v_user = p_user AND ts_p >= ts_v AND ts_p <= ts_v + interval 1 hour"),
        "full_outer")

  /** Bounded run of [[attributionJoinFull]]: Append emissions (pairs +
    * null-padded rows from BOTH sides) land in a checkpointed parquet
    * sink; the batch rollup keeps the watermark-DECIDED region — rows
    * whose outcome a longer replay could never change: a row carrying
    * a view is decided once the view's whole match horizon clears the
    * final watermark (ts_v < m − 3 h, delay 2 h + horizon 1 h), a
    * purchase-only row once the purchase itself does (ts_p < m − 3 h,
    * stricter than needed on purpose — one shared cutoff literal in
    * both engines). The batch FULL JOIN under the same per-row filter
    * is the SQL oracle; per user it counts pairs, view-only padding,
    * purchase-only padding.
    */
  def runAttributionFullBounded(spark: SparkSession, sfDir: String,
                                queryName: String = "graft_stream_ss_full"): DataFrame =
  FileStreams.withBoundedStreamPartitions(spark, s"$sfDir/events.parquet") {
    def side(tpe: String): DataFrame =
      tsAsTimestamp(rawEventStream(spark, sfDir))
        .filter(col("event_type") === tpe)
        .select("user_id", "ts", "value")
    val (outDir, ckptDir) = FileStreams.freshSinkDirs(queryName)
    val q = attributionJoinFull(side("view"), side("purchase"))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val mx = graft.queries.Analytics.loadEvents(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(max(unix_micros(col("ts"))).as("m"))
      .filter(col("event_type").isin("view", "purchase"))
      .agg(min("m")).head().getLong(0)
    val cutoff = timestamp_micros(lit(mx - 3L * 3600L * 1000000L))
    spark.read.parquet(outDir)
      .filter((col("ts_v").isNotNull && col("ts_v") < cutoff) ||
        (col("ts_v").isNull && col("ts_p") < cutoff))
      .groupBy(coalesce(col("v_user"), col("p_user")).as("user_id"))
      .agg(
        sum((col("ts_v").isNotNull && col("ts_p").isNotNull).cast("long")).as("n_pairs"),
        sum((col("ts_v").isNotNull && col("ts_p").isNull).cast("long")).as("n_view_only"),
        sum(col("ts_v").isNull.cast("long")).as("n_purchase_only"))
      .orderBy("user_id")
  }

  /** Run the streaming pipeline over the bounded events parquet via a
    * file stream, write to an in-memory sink, and return the final
    * result — used by the spec to assert batch/stream parity.
    */
  def runBounded(spark: SparkSession, sfDir: String, queryName: String = "graft_stream"): DataFrame =
  FileStreams.withBoundedStreamPartitions(spark, s"$sfDir/events.parquet") {
    val stream = tsAsTimestamp(rawEventStream(spark, sfDir))
    val q = windowedAgg(stream)
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
      .orderBy("window_start", "event_type")
  }
}
