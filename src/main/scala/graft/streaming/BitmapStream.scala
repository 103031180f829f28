package graft.streaming

import graft.functions.GraftFunctions
import graft.queries.{Analytics, Sketches}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    val feed = Analytics.loadEvents(spark, sfDir).select("event_type", "user_id")
    val init = spark.range(0).select(col("id").cast("string").as("event_type"),
      lit(Array.emptyByteArray).as("bm"))
    val (state, stateRoot) = ChainedState.run(spark, "bitmapstream", feed, 8, init,
      (st, batch) => st
        .unionByName(batch.groupBy("event_type")
          .agg(GraftFunctions.bitmap_build(col("user_id"), maxId).as("bm")))
        .groupBy("event_type")
        .agg(GraftFunctions.bitmap_or(col("bm")).as("bm")))
    lastStateRoot = stateRoot
    Sketches.bitmapCensus(state)
  }
}
