package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

/** Bounded-state streaming dedup under late arrivals (SURVEY.md §2d) —
  * `dropDuplicatesWithinWatermark`: the day-2 fix for
  * [[DocStream.dedupedDocs]]'s forever-growing keyed state. Plain
  * `dropDuplicates` keeps one state row per DISTINCT key for the
  * lifetime of the query; with event time + a watermark the store
  * evicts a key once the watermark passes (event time + delay), so
  * state is bounded by the key arrival rate × the lateness budget —
  * the only shape a 24/7 deployment can run.
  *
  * The trade is explicit and DETERMINISTIC under a controlled feed,
  * so the operator drives one (micro-batch boundaries pinned by
  * one-file-per-trigger over two mtime-ordered planted files):
  *
  *   batch 1: first half of events (ts < Jan 16) + an exact copy of
  *            every 3rd event — in-batch duplicates, DROPPED;
  *   batch 2: second half + a same-ts replay of every 5th early event
  *            (now below the watermark → dropped, late or duplicate —
  *            both rules agree);
  *   batch 3: a re-emission of every 7th early event (ts < Jan 10 —
  *            state EVICTED by the end-of-batch-2 cleanup, whose
  *            eviction watermark is batch 1's maxTs − delay) shifted
  *            +35 days above the final watermark → RE-ADMITTED as new;
  *            plus a same-ts replay of every 13th early event — state
  *            also evicted, but the ORIGINAL event time is now far
  *            below the watermark → dropped by the LATE filter (the
  *            numRowsDroppedByWatermark witness: not a duplicate hit,
  *            state is gone — the watermark itself rejects it).
  *            (Three batches because state cleanup lags one batch:
  *            the watermark used to evict during batch N is computed
  *            from batch N−1's event times.)
  *
  * The re-admissions are the eviction WITNESS: had state survived,
  * those keys would have been dropped as duplicates — bounded state
  * is observable in the row census, not just in metrics (the spec
  * additionally pins the state-store row count below the distinct-key
  * count and the late replays in numRowsDroppedByWatermark).
  *
  * Scale shape: dedup state is hash-partitioned by key across
  * executors like any stateful operator; eviction keeps each
  * partition's store ∝ keys-per-lateness-window. The census oracle is
  * the closed-form replay of the three rules over the same plant.
  */
object WatermarkDedup {

  private val splitTs = "2024-01-16"
  private val evictSafeTs = "2024-01-10" // clear of the 2h live-state fringe
  private val delay = "1 hour"

  /** Fail-fast validation of the planted three-batch geometry (round-9
    * ADVICE): the batch semantics are welded to the split/evict-safe
    * cutoffs, and a corpus whose event times do not straddle them would
    * DEGENERATE the plant at runtime (empty batches, no eviction
    * witness) instead of failing loudly. One single-row aggregate pins
    * the four facts the three-batch derivation needs BEFORE the query
    * runs:
    *   1. events exist below `evictSafeTs` (the re-emission pool);
    *   2. batch 1's eviction watermark clears the evict-safe fringe —
    *      max(first half) ≥ evictSafeTs + delay + 1h margin, so every
    *      %7/%13 key below evictSafeTs is provably OUT of state when
    *      batch 3 runs;
    *   3. the second half (batch 2) is non-empty — its maxTs drives
    *      the FINAL watermark batch 3's re-admissions must clear;
    *   4. the +35-day shift clears that final watermark:
    *      min(ts) + 35d > max(ts) − delay, i.e. the corpus spans
    *      strictly less than 35 days + 1h.
    */
  private def validateGeometry(base: DataFrame): Unit = {
    val split = lit(splitTs).cast("timestamp")
    val evictSafe = lit(evictSafeTs).cast("timestamp")
    // comparisons stay engine-side (timestamp arithmetic in Spark, not
    // the JVM) so the guard is immune to session/JVM timezone skew
    // coalesce the conditional sums: on an EMPTY table sum() is NULL
    // and a bare getLong would NPE instead of reaching the diagnostic
    val g = base.agg(
      coalesce(sum(when(col("ts") < evictSafe, 1L).otherwise(0L)), lit(0L)).as("n_early"),
      (max(when(col("ts") < split, col("ts"))) >=
        evictSafe + expr("INTERVAL 2 HOURS")).as("evict_clears"),
      coalesce(sum(when(col("ts") >= split, 1L).otherwise(0L)), lit(0L)).as("n_b"),
      // the exact invariant is min+35d > max−delay, i.e. span < 35d+1h —
      // requiring a bare 35d would reject corpora the semantics accept
      (max(col("ts")) < min(col("ts")) + expr("INTERVAL 35 DAYS 1 HOUR"))
        .as("shift_clears")
    ).head()
    require(g.getLong(0) > 0,
      s"watermark-dedup plant degenerate: no events before $evictSafeTs — no eviction pool")
    require(!g.isNullAt(1) && g.getBoolean(1),
      s"watermark-dedup plant degenerate: batch 1's eviction watermark " +
        s"(max first-half ts − $delay) does not clear $evictSafeTs + 1h margin")
    require(g.getLong(2) > 0,
      s"watermark-dedup plant degenerate: no events at/after $splitTs — batch 2 empty")
    require(!g.isNullAt(3) && g.getBoolean(3),
      "watermark-dedup plant degenerate: corpus spans ≥ 35 days + 1h — the +35d " +
        "re-emission shift would not clear the final watermark")
  }

  /** The streaming transform under test — exposed for plan/metric specs. */
  def dedupWithinWatermark(stream: DataFrame): DataFrame =
    stream.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Plant the three batch files (mtime-ordered so the file source
    * replays them as distinct micro-batches) and return the input
    * directory — a fresh per-run temp dir (each run's checkpoint is
    * also fresh, so input-path stability across runs is not needed;
    * [[runDedupWatermarkBounded]] deletes it after the query drains).
    */
  def plantBatches(spark: SparkSession, sfDir: String): String = {
    // normalizeTs: the raw column can be TIMESTAMP_NTZ / int64-nanos —
    // the watermark needs a true TIMESTAMP, and the planted files are
    // written post-normalization so the stream read sees one too
    val base = graft.queries.Analytics.loadEvents(spark, sfDir)
    validateGeometry(base)
    val a = base.filter(col("ts") < lit(splitTs).cast("timestamp"))
    val b = base.filter(col("ts") >= lit(splitTs).cast("timestamp"))
    val inBatchDup = a.filter(col("event_id") % 3 === 0)
    val lateReplay = a.filter(col("event_id") % 5 === 0)
    // +35d puts every re-emission above the FINAL watermark (second
    // half's maxTs − delay ≈ Jan 30), so none is late-dropped
    val evictedReplay = a
      .filter(col("event_id") % 7 === 0 &&
        col("ts") < lit(evictSafeTs).cast("timestamp"))
      .withColumn("ts", col("ts") + expr("INTERVAL 35 DAYS"))
    // original-ts replay of ALSO-evicted keys: below the final
    // watermark, so the late filter (not the dedup state) drops it
    val lateAfterEviction = a.filter(col("event_id") % 13 === 0 &&
      col("ts") < lit(evictSafeTs).cast("timestamp"))

    val dir = Files.createTempDirectory("graft-wmdedup-")
    def writeOne(df: DataFrame, name: String, mtimeOffsetSec: Long): Unit = {
      // stage OUTSIDE the streamed dir (its leftover _SUCCESS/.crc are
      // hidden-file-filtered by the source, but junk in a listing-time
      // path is junk), move the single part in, then delete the stage
      val stage = Files.createTempDirectory("graft-wmdedup-stage-")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val listing = Files.list(stage)
      val part = try listing.filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      finally listing.close()
      val dest = dir.resolve(name)
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest,
        FileTime.fromMillis(System.currentTimeMillis() + mtimeOffsetSec * 1000))
      graft.util.Fs.deleteRecursively(stage)
    }
    writeOne(a.unionByName(inBatchDup), "batch-0.parquet", -240)
    writeOne(b.unionByName(lateReplay), "batch-1.parquet", -120)
    writeOne(evictedReplay.unionByName(lateAfterEviction), "batch-2.parquet", 0)
    dir.toString
  }

  /** Start the bounded query over the planted feed into a CHECKPOINTED
    * parquet file sink (the production shape the repo's streaming
    * rollups pin: admitted-event volume never touches the driver —
    * a memory sink would collect essentially the whole corpus); one
    * file per trigger pins the batch boundaries the semantics depend
    * on. Returns (query, inputDir, sinkDir).
    */
  def startQuery(spark: SparkSession, sfDir: String,
                 queryName: String): (StreamingQuery, String, String) = {
    val inputDir = plantBatches(spark, sfDir)
    val (outDir, ckptDir) = FileStreams.freshSinkDirs(queryName)
    val schema = graft.queries.Analytics.loadEvents(spark, sfDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inputDir)
    val q = dedupWithinWatermark(stream)
      .select("event_id", "ts", "event_type")
      .writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    (q, inputDir, outDir)
  }

  /** Bounded run → per-type admitted-row census (the oracle row) —
    * a batch aggregate whose only input is the file sink.
    */
  def runDedupWatermarkBounded(spark: SparkSession, sfDir: String,
                               queryName: String = "graft_stream_wmdedup"): DataFrame =
  FileStreams.withBoundedStreamPartitions(spark, s"$sfDir/events.parquet") {
    val (q, inputDir, outDir) = startQuery(spark, sfDir, queryName)
    q.awaitTermination()
    graft.util.Fs.deleteRecursively(inputDir)
    spark.read.parquet(outDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("event_type")
  }

  /** Closed-form replay of the three rules: admitted = first half +
    * second half + the past-eviction re-emissions.
    */
  val oracleSql: String =
    s"""WITH a AS (SELECT * FROM events WHERE ts < TIMESTAMP '$splitTs'),
       |b AS (SELECT * FROM events WHERE ts >= TIMESTAMP '$splitTs'),
       |readmitted AS (
       |  SELECT event_type FROM a
       |  WHERE event_id % 7 = 0 AND ts < TIMESTAMP '$evictSafeTs'
       |)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows FROM (
       |  SELECT event_type FROM a
       |  UNION ALL SELECT event_type FROM b
       |  UNION ALL SELECT event_type FROM readmitted
       |) GROUP BY 1 ORDER BY 1""".stripMargin
}
