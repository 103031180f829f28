package graft.streaming

import graft.queries.RateSpike
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming rate-spike monitor — the streaming twin of
  * [[graft.queries.RateSpike.qRateSpike]] (the `stream_funnel` /
  * `stream_merge` symmetry: every batch analytics family member that
  * makes sense as a stream gets a twin sharing the batch oracle).
  *
  * The event feed arrives as files; each micro-batch's per-hour counts
  * merge ADDITIVELY into a keyed hourly state via `foreachBatch` — the
  * partial-aggregate shape: cross-batch state is load-bearing because
  * a single hour's events span many files, and dropping carried counts
  * between batches undercounts every such hour (the chunked spec pins
  * ≥ 2 chained states). Only after the bounded replay does the
  * trailing-24h sweep run — over the |hours|-row state, which is
  * cardinality-trivial at any corpus size, exactly like the batch
  * operator's tail. At 100 TB the state side is a bucketed hourly
  * table and each micro-batch shuffles only its own counts.
  *
  * Spike rule, planting, warm-up exclusion, and output columns are
  * IDENTICAL to the batch operator — `q_rate_spike`'s oracle SQL is
  * this operator's oracle too.
  */
object RateSpikeStream {

  /** State root of the most recent run in this JVM (spec hook). */
  @volatile var lastStateRoot: String = _

  /** The ADDITIVE hourly fold — the one chained-state merge that is NOT
    * naturally idempotent (bitmap-OR and top-k folds absorb replays;
    * a count-sum double-counts), so it is exactly the fold the
    * batch-id replay spec must drive through [[ChainedState.foldBatch]].
    */
  private[streaming] val hourlyAdd: (DataFrame, DataFrame) => DataFrame =
    (st, batch) => st
      .unionByName(batch.groupBy("h").agg(count(lit(1)).as("n")))
      .groupBy("h").agg(sum("n").as("n"))

  def runRateSpikeBounded(spark: SparkSession, sfDir: String): DataFrame = {
    // the planted hour feed, split across files so hours straddle
    // micro-batches (repartition is round-robin: every hour's rows
    // land in many files)
    val init = spark.range(0).select(col("id").as("h"), col("id").as("n"))
    val (hourly, stateRoot) = ChainedState.run(spark, "ratespike",
      RateSpike.plantedEvents(spark, sfDir), 8, init, hourlyAdd)
    lastStateRoot = stateRoot
    // shared sweep: the carried state is already the (h, n) hourly
    // series, so the global-order window input is |hours| rows —
    // the bound RateSpike.trailingSweep documents and its spec pins
    RateSpike.trailingSweep(hourly, "stream_rate_spike")
  }
}
