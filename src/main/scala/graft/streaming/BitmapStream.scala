package graft.streaming

import graft.functions.GraftFunctions
import graft.queries.Analytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental EXACT distinct maintenance — the streaming twin of
  * `q_bitmap_distinct`, and the payoff of mergeable bitmap states:
  * a running per-group `count(DISTINCT)` is NOT incrementally
  * maintainable from counts (you cannot add counts of overlapping
  * sets), but it IS from bitmaps — each micro-batch builds its own
  * per-type bitmaps and the running state is `state OR batch`, a
  * constant-size word-wise merge with no recount and no rescan of
  * earlier data. The same property powers the cross-batch census here
  * and a 100 TB incremental materialized view alike.
  *
  * Users appear in MANY micro-batches (the feed is round-robin
  * repartitioned), so an engine that dropped carried state — or
  * ADDED counts instead of OR-ing sets — overcounts; convergence to
  * the all-at-once batch census (`q_bitmap_distinct`'s own oracle) is
  * the contract, with a chunked-replay spec pinning the state chain.
  */
object BitmapStream {

  @volatile var lastStateRoot: String = _

  def runBitmapBounded(spark: SparkSession, sfDir: String,
                       maxId: Int = 1 << 20): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft-bitmapstream-")
    val feedDir = base.resolve("feed").toString
    val stateRoot = base.resolve("state").toString
    lastStateRoot = stateRoot
    Analytics.loadEvents(spark, sfDir)
      .select("event_type", "user_id")
      .repartition(8)
      .write.mode("overwrite").parquet(feedDir)

    val statePath = new java.util.concurrent.atomic.AtomicReference[String](
      s"$stateRoot/state-init")
    spark.range(0).select(col("id").cast("string").as("event_type"),
        lit(Array.emptyByteArray).as("bm"))
      .write.mode("overwrite").parquet(statePath.get)

    val q = spark.readStream
      .schema(spark.read.parquet(feedDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val batchBitmaps = batch.groupBy("event_type")
          .agg(GraftFunctions.bitmap_build(col("user_id"), maxId).as("bm"))
        val merged = spark.read.parquet(statePath.get)
          .unionByName(batchBitmaps)
          .groupBy("event_type")
          .agg(GraftFunctions.bitmap_or(col("bm")).as("bm"))
        val next = s"$stateRoot/state-$id"
        merged.write.mode("overwrite").parquet(next)
        statePath.set(next)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val state = spark.read.parquet(statePath.get)
    val perType = state.select(col("event_type").as("scope"),
      GraftFunctions.bitmap_card(col("bm")).as("n_distinct"))
    val unionRow = state
      .agg(GraftFunctions.bitmap_or_count(col("bm")).as("n_distinct"))
      .select(lit("__union").as("scope"), col("n_distinct"))
    perType.unionByName(unionRow).orderBy("scope")
  }
}
