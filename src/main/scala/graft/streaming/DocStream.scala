package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming exact dedup — the streaming twin of
  * [[graft.dedup.Dedup.exact]]: documents arrive as files, duplicate
  * (source, text-hash) rows are dropped ACROSS micro-batches by the
  * `dropDuplicates` state store, survivors land in the sink.
  *
  * Scale notes: keyed dedup state grows with DISTINCT keys, not events —
  * the right state shape for a dedup operator; a 24/7 deployment over an
  * append-only corpus bounds it further with event time +
  * `dropDuplicatesWithinWatermark`. The aggregation runs over the SINK
  * table rather than chained after the dedup inside one streaming query:
  * stacking two stateful operators without a watermark is exactly the
  * shape Structured Streaming restricts.
  */
object DocStream {

  /** Deduped stream as (source, text_hash): what flows to the sink. */
  def dedupedDocs(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), md5(lower(col("text"))).as("text_hash"))
      .dropDuplicates("source", "text_hash")

  /** Deduped stream into a CHECKPOINTED parquet file sink — the
    * production shape: the checkpoint (source offsets + dedup state +
    * sink commit log) makes the pipeline exactly-once end to end.
    * Restarting the query against the same checkpoint reprocesses
    * nothing and appends nothing; killing it mid-run and restarting
    * loses nothing. The memory-sink runners are parity harnesses; this
    * is the sink a real corpus-dedup deployment writes.
    *
    * Returns the sink as a DataFrame (read back through the sink's own
    * commit log via the parquet read, so uncommitted files never leak).
    */
  def runDedupToFileSink(spark: SparkSession, sfDir: String,
                         outDir: String, checkpointDir: String): DataFrame = {
    val stream = FileStreams.readStream(spark, s"$sfDir/documents.parquet")
    val q = dedupedDocs(stream)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
  }

  /** Streaming PII scrub — redaction on the INGEST path, before
    * anything is persisted (the shape a compliance pipeline requires:
    * raw text must never land in the sink). The per-document audit
    * projection is stateless ([[graft.text.Pii.perDocAudit]]), so it
    * runs inside the micro-batch with no state store; the rollup
    * aggregates the SINK table (same pattern as [[runDedupBounded]] —
    * chaining a global aggregate after the stream would force
    * Complete/Update mode for no benefit). On a bounded input the
    * audit must equal the batch scrub exactly, which is the oracle.
    */
  def runScrubBounded(spark: SparkSession, sfDir: String,
                      queryName: String = "graft_stream_pii"): DataFrame = {
    val stream = FileStreams.readStream(spark, s"$sfDir/documents.parquet")
    val q = graft.text.Pii.perDocAudit(graft.text.Pii.plantedPiiRows(stream))
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.text.Pii.auditRollup(spark.table(queryName))
  }

  /** Bounded run: file-stream the documents table, dedup across
    * micro-batches, then count unique docs per source from the sink —
    * on a bounded input this must equal the batch distinct count (the
    * SQL oracle).
    */
  def runDedupBounded(spark: SparkSession, sfDir: String,
                      queryName: String = "graft_stream_dedup"): DataFrame =
  FileStreams.withBoundedStreamPartitions(spark, s"$sfDir/documents.parquet") {
    val stream = FileStreams.readStream(spark, s"$sfDir/documents.parquet")
    val q = dedupedDocs(stream)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
      .groupBy("source")
      .agg(count(lit(1)).as("n_unique"))
      .orderBy("source")
  }
}
