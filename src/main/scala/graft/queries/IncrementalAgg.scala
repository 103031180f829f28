package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (SURVEY.md §2b) — the
  * materialized-view refresh every warehouse runs nightly: a daily
  * (day, event_type) rollup is kept as a persisted MV, and when a new
  * drop arrives the MV is REFRESHED by merging aggregate STATES — the
  * base corpus is never rescanned (the `dedup_incremental_indexed`
  * discipline applied to aggregation). This works because every kept
  * statistic is a MERGEABLE state: count and sum add, min/max combine
  * — so refresh = union(MV states, batch partial states) → re-reduce.
  * (Non-mergeable stats — exact distinct counts — swap in mergeable
  * SETS: the q_bitmap_distinct bitmaps or q_hll_sketch states; that's
  * the documented knob, same plan shape.)
  *
  * Shape: the batch partial-aggregates BEFORE the union (map-side
  * combine bounds the shuffle by touched cells, not batch rows); the
  * MV side reads kilobytes of states. At 100 TB the refresh cost is
  * ∝ the drop, never ∝ history — the spec pins zero `events.parquet`
  * scans in the refresh plan, and the oracle is the FULL recompute
  * from raw events, so "refresh == recompute" is the verified
  * contract. Money moves as exact BIGINT cents; `day` is exact
  * integer µs division (no calendar semantics to diverge).
  */
object IncrementalAgg {

  /** The MV cell grain: exact integer day index + event type + cents. */
  private def cells(events: DataFrame): DataFrame =
    events.select(
      call_function("div", unix_micros(col("ts")), lit(86400000000L)).as("day"),
      col("event_type"),
      floor(col("value") * 100 + 0.5).cast("long").as("cents"))

  private def aggCells(df: DataFrame): DataFrame =
    df.groupBy("day", "event_type").agg(
      count(lit(1)).as("n"), sum("cents").as("sum_cents"),
      min("cents").as("min_cents"), max("cents").as("max_cents"))

  /** Day-1 setup (the part a production system amortizes): split the
    * corpus at the 90th-percentile day, persist the MV (aggregated
    * history) and the raw batch (the arriving drop). Returns
    * (mvPath, batchPath).
    */
  def writeSnapshot(spark: SparkSession, sfDir: String): (String, String) = {
    val mvPath = graft.util.TempDirs.forInput(sfDir, "incragg-mv")
    val batchPath = graft.util.TempDirs.forInput(sfDir, "incragg-batch")
    val c = cells(Analytics.loadEvents(spark, sfDir)).localCheckpoint()
    val b = c.agg(min("day").as("lo"), max("day").as("hi")).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val cutoff = lo + ((hi - lo) * 9) / 10
    aggCells(c.filter(col("day") < cutoff))
      .write.mode("overwrite").parquet(mvPath)
    c.filter(col("day") >= cutoff)
      .write.mode("overwrite").parquet(batchPath)
    (mvPath, batchPath)
  }

  /** The refresh under test: merge MV states with the batch's partial
    * aggregate. Handles overlapping cells correctly (states re-reduce)
    * even though the day split makes them disjoint here.
    */
  def refresh(spark: SparkSession, mvPath: String, batchPath: String): DataFrame =
    spark.read.parquet(mvPath)
      .unionByName(aggCells(spark.read.parquet(batchPath)))
      .groupBy("day", "event_type").agg(
        sum("n").as("n"), sum("sum_cents").as("sum_cents"),
        min("min_cents").as("min_cents"), max("max_cents").as("max_cents"))

  def qIncrementalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val (mv, batch) = writeSnapshot(spark, sfDir)
    refresh(spark, mv, batch).orderBy("day", "event_type")
  }

  /** Full recompute — refresh must equal this exactly. */
  val oracleSql: String =
    """WITH c AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events
      |)
      |SELECT day, event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents,
      |  min(cents) AS min_cents, max(cents) AS max_cents
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
