package graft.streaming

import graft.SparkSpec
import graft.queries.Analytics

class StreamingSpec extends SparkSpec {

  test("streaming dedup converges to the batch distinct counts") {
    import org.apache.spark.sql.functions._
    val streamed = DocStream.runDedupBounded(spark, sf0001, "spec_stream_dedup")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = spark.read.parquet(s"$sf0001/documents.parquet")
      .groupBy("source")
      .agg(countDistinct(md5(lower(col("text")))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch,
      "bounded streaming dropDuplicates must equal the batch distinct count")
  }

  test("streaming PII scrub audit equals the batch scrub exactly") {
    val streamed = DocStream.runScrubBounded(spark, sf0001, "spec_stream_pii")
      .collect().map(_.toSeq).toSeq
    val batch = graft.text.Pii.piiScrub(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      s"ingest-path scrub must match the batch audit:\n$streamed\nvs\n$batch")
  }

  test("stream-static enrichment join converges to the batch join") {
    import org.apache.spark.sql.functions._
    val streamed = EventStream.runEnrichJoinBounded(spark, sf0001, "spec_stream_join")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val batch = EventStream.enrichJoin(
        Analytics.loadEvents(spark, sf0001),
        spark.read.parquet(s"$sf0001/customer.parquet").select("c_custkey", "c_mktsegment"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(streamed == batch)
  }

  test("stream-stream attribution join: Append-mode replay equals the batch self-join") {
    import org.apache.spark.sql.functions._
    val streamed = EventStream.runAttributionBounded(spark, sf0001, "spec_ss_join")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val ev = Analytics.loadEvents(spark, sf0001)
    val batch = EventStream.attributionJoin(
        ev.filter(col("event_type") === "view").select("user_id", "ts"),
        ev.filter(col("event_type") === "purchase").select("user_id", "ts", "value"))
      .groupBy(col("v_user").as("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("p_value"), 2).as("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(streamed.nonEmpty, "the bounded replay must attribute at least one pair")
    assert(streamed == batch, s"stream=$streamed batch=$batch")
  }

  test("left-outer stream-stream join: watermark emits null-padded unmatched views") {
    import org.apache.spark.sql.functions._
    val streamed = EventStream.runAttributionOuterBounded(spark, sf0001, "spec_ss_outer")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(streamed.nonEmpty, "the decided region must contain at least one view")
    assert(streamed.exists { case (_, (nRows, nAttr, _)) => nRows > nAttr },
      "at least one decided view must be UNMATCHED — its null-padded row can only " +
        "come from watermark-driven eviction, which is the semantics under test")
    // batch left join under the same decided-region cutoff
    val ev = Analytics.loadEvents(spark, sf0001)
    val mx = ev.filter(col("event_type").isin("view", "purchase"))
      .groupBy("event_type").agg(max(unix_micros(col("ts"))).as("m"))
      .agg(min("m")).head().getLong(0)
    val cutoff = mx - 3L * 3600L * 1000000L
    val batch = EventStream.attributionJoinOuter(
        ev.filter(col("event_type") === "view").select("user_id", "ts"),
        ev.filter(col("event_type") === "purchase").select("user_id", "ts", "value"))
      .filter(unix_micros(col("ts_v")) < cutoff)
      .groupBy(col("v_user").as("user_id"))
      .agg(count(lit(1)).as("n_rows"), count(col("ts_p")).as("n_attributed"),
        round(sum(coalesce(col("p_value"), lit(0.0))), 2).as("attributed_value"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(streamed == batch, s"stream=$streamed batch=$batch")
  }

  test("full-outer stream-stream join: watermark null-pads BOTH sides, " +
    "and the decided region equals the batch full join") {
    import org.apache.spark.sql.functions._
    val streamed = EventStream.runAttributionFullBounded(spark, sf0001, "spec_ss_full")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(streamed.nonEmpty, "the decided region must be non-empty")
    // BOTH padding directions must be witnessed: a view no purchase
    // matched AND a purchase no view claimed — each null-padded row can
    // only come from watermark-driven state expiry on its own side
    assert(streamed.exists(_._2._2 > 0),
      "at least one decided view must be UNMATCHED (view-side null padding)")
    assert(streamed.exists(_._2._3 > 0),
      "at least one decided purchase must be UNCLAIMED (purchase-side null padding)")
    // batch full join under the same per-row decided filter
    val ev = Analytics.loadEvents(spark, sf0001)
    val mx = ev.filter(col("event_type").isin("view", "purchase"))
      .groupBy("event_type").agg(max(unix_micros(col("ts"))).as("m"))
      .agg(min("m")).head().getLong(0)
    val cutoff = timestamp_micros(lit(mx - 3L * 3600L * 1000000L))
    val batch = EventStream.attributionJoinFull(
        ev.filter(col("event_type") === "view").select("user_id", "ts"),
        ev.filter(col("event_type") === "purchase").select("user_id", "ts", "value"))
      .filter((col("ts_v").isNotNull && col("ts_v") < cutoff) ||
        (col("ts_v").isNull && col("ts_p") < cutoff))
      .groupBy(coalesce(col("v_user"), col("p_user")).as("user_id"))
      .agg(
        sum((col("ts_v").isNotNull && col("ts_p").isNotNull).cast("long")).as("n_pairs"),
        sum((col("ts_v").isNotNull && col("ts_p").isNull).cast("long")).as("n_view_only"),
        sum(col("ts_v").isNull.cast("long")).as("n_purchase_only"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(streamed == batch, s"stream=$streamed batch=$batch")
  }

  test("stream-stream rollups aggregate from the file sink, not a driver memory sink") {
    // Production shape: Append-mode pair emissions go to a checkpointed
    // parquet file sink (distributed write); the rollup is a batch
    // aggregate whose ONLY input relation is that sink. A driver memory
    // sink would (a) register a temp view under the query name and
    // (b) hold the full O(matched pairs) emission volume on the driver.
    val name = "spec_ss_sink_shape"
    val df = EventStream.runAttributionBounded(spark, sf0001, name)
    assert(!spark.catalog.tableExists(name),
      "pair emissions must not land in a driver memory sink")
    val rels = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l.relation
    }
    assert(rels.nonEmpty, "the rollup must read a file relation")
    assert(rels.forall {
      case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        h.location.rootPaths.forall(_.toString.contains(s"graft-$name"))
      case _ => false
    }, s"the rollup's only input must be the checkpointed parquet sink: $rels")
    val outerName = "spec_ss_outer_sink_shape"
    EventStream.runAttributionOuterBounded(spark, sf0001, outerName)
    assert(!spark.catalog.tableExists(outerName),
      "outer-join emissions must not land in a driver memory sink either")
  }

  test("stream-stream join state spans micro-batches (chronological chunk arrival)") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import org.apache.spark.sql.functions._
    // 3 chunk files in event-time order, one per micro-batch
    // (maxFilesPerTrigger=1): pairs whose view and purchase arrive in
    // DIFFERENT batches can only come out of the join's state store —
    // the watermark (2 h) deliberately exceeds the attribution window
    // (1 h) so no cross-batch view is evicted before its purchases land.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // normalized ts (micros TIMESTAMP) so chunk files carry the engine's
    // event-time type whatever the physical type underneath
    val ev = Analytics.normalizeTs(spark.read.parquet(s"$sf0001/events.parquet")).orderBy("ts")
    val n = ev.count()
    val rows = ev.collect()
    val cuts = Seq(rows((n / 3).toInt).getAs[java.sql.Timestamp]("ts"),
      rows((2 * n / 3).toInt).getAs[java.sql.Timestamp]("ts"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ss-chunks-")
    Seq(
      ev.filter(col("ts") < cuts(0)),
      ev.filter(col("ts") >= cuts(0) && col("ts") < cuts(1)),
      ev.filter(col("ts") >= cuts(1))
    ).zipWithIndex.foreach { case (chunk, i) =>
      chunk.coalesce(1).write.parquet(s"$dir/c$i")
      val f = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/c$i"))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      // zero-pad so modification-time/name order == event-time order
      java.nio.file.Files.createSymbolicLink(dir.resolve(f"chunk_$i%02d.parquet"), f)
    }
    def side(tpe: String) = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
      .filter(col("event_type") === tpe)
      .select("user_id", "ts", "value")
    val q = EventStream.attributionJoin(side("view"), side("purchase"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("spec_ss_chunked")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) > 1,
      "chunked arrival must produce multiple non-empty micro-batches")
    val streamed = spark.table("spec_ss_chunked")
      .groupBy(col("v_user").as("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("p_value"), 2).as("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val evb = Analytics.loadEvents(spark, sf0001)
    val batch = EventStream.attributionJoin(
        evb.filter(col("event_type") === "view").select("user_id", "ts"),
        evb.filter(col("event_type") === "purchase").select("user_id", "ts", "value"))
      .groupBy(col("v_user").as("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("p_value"), 2).as("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(streamed == batch,
      s"chunked stream must converge to the batch join: $streamed vs $batch")
  }

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

  test("flatMapGroupsWithState running stats converge to the batch aggregate") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = java.nio.file.Paths.get(s"$sf0001/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-state-stream-")
    java.nio.file.Files.createSymbolicLink(dir.resolve("events.parquet"), src)
    val schema = spark.read.parquet(src.toString).schema
    // runningUserStats folds ts as a plain long: normalize then expose micros
    val stream = Analytics.normalizeTs(spark.readStream.schema(schema).parquet(dir.toString))
      .withColumn("ts", unix_micros(col("ts")))
    val q = EventStream.runningUserStats(stream)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("spec_user_state")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // counts are monotone: the max per user is the final state
    val streamed = spark.table("spec_user_state")
      .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val batch = graft.queries.Analytics.loadEvents(spark, sf0001)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), (floor(sum("value") * 100 + 0.5) / 100).as("v"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(streamed.keySet == batch.keySet)
    val diffs = streamed.collect { case (k, v) if batch(k) != v => (k, v, batch(k)) }
    assert(diffs.isEmpty, s"state/batch mismatch: ${diffs.take(5)}")
  }

  test("online iterative SVM: stream chunks accumulate SVs into a usable model") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-svm-stream-").toString
    // 3 arrival chunks by id range, one file each
    for ((lo, hi, i) <- Seq((0, 167, 0), (167, 334, 1), (334, 500, 2)))
      emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .coalesce(1).write.parquet(s"$dir/chunk_$i")
    // the source dir streams all chunk files
    val streamDir = java.nio.file.Files.createTempDirectory("graft-svm-stream-src-")
    for (i <- 0 to 2) {
      val f = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/chunk_$i"))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.createSymbolicLink(streamDir.resolve(s"c$i.parquet"), f)
    }
    val trainer = new graft.streaming.StreamingSvm(
      graft.svm.Smo.Params(kernel = graft.svm.Kernel.Linear))
    trainer.runBounded(spark, streamDir.toString, maxFilesPerTrigger = 1)

    assert(trainer.batchStats.size == 3, s"expected 3 micro-batches: ${trainer.batchStats}")
    assert(trainer.globalSvCount > 0)
    val m = trainer.model
    assert(m != null && m.labels.length == 10)
    // the streamed model must be in the quality band of a batch solve
    val all = emb.collect().map(r =>
      graft.svm.LabeledVec(r.getInt(2), r.getSeq[Float](1).toArray))
    val acc = all.count(v => m.predict(v.features) == v.label).toDouble / all.length
    assert(acc > 0.3, s"streamed-model accuracy $acc")
  }

  test("online iterative SVM fails loudly when a batch would overflow maxGlobalSvs") {
    // Same loud-failure contract as the batch path (ParallelSvm.iterative):
    // the noisy embeddings are non-separable, so the first batch alone
    // yields far more SVs than a tiny cap — the trainer must throw
    // BEFORE folding them into driver state, not accumulate silently.
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "label", "embedding")
    val trainer = new graft.streaming.StreamingSvm(
      graft.svm.Smo.Params(kernel = graft.svm.Kernel.Linear), maxGlobalSvs = 20)
    val e = intercept[IllegalStateException] {
      trainer.processBatch(emb.limit(100), batchId = 0L)
    }
    assert(e.getMessage.contains("maxGlobalSvs"))
    assert(trainer.globalSvCount == 0,
      "state must not grow when the cap fires — the check precedes the fold")
  }

  test("sessionization runs as a genuine stream with watermarked session state") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = java.nio.file.Paths.get(s"$sf0001/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-stream-")
    java.nio.file.Files.createSymbolicLink(dir.resolve("events.parquet"), src)
    val schema = spark.read.parquet(src.toString).schema
    val stream = Analytics.normalizeTs(spark.readStream.schema(schema).parquet(dir.toString))
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

  test("checkpointed file sink is exactly-once: a restart appends nothing") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-filesink-").toString
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val first = DocStream.runDedupToFileSink(spark, sf0001, out, ckpt).collect()
    val batch = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("source"), md5(lower(col("text"))).as("text_hash"))
      .distinct().collect()
    assert(first.map(_.toSeq).toSet == batch.map(_.toSeq).toSet,
      "file-sink contents must equal the batch distinct set")
    // restart against the same checkpoint: offsets are committed, the
    // dedup state is restored — nothing reprocessed, nothing appended
    val second = DocStream.runDedupToFileSink(spark, sf0001, out, ckpt).collect()
    assert(second.length == first.length,
      s"restart must be a no-op: ${first.length} -> ${second.length} rows")
  }
}
