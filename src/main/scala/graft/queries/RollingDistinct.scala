package graft.queries

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rolling-window EXACT distinct (SURVEY.md §2b) — 7-day active
  * users per day, the metric every growth dashboard carries and the
  * one a RANGE-frame window cannot produce: `count(DISTINCT) OVER
  * (RANGE 6 PRECEDING)` is unsupported (Spark) or a per-frame rescan
  * (engines that allow it), because distinct counts don't merge. SETS
  * merge: build ONE bitmap per day (the q_bitmap_distinct mergeable
  * aggregate), replicate each day's KILOBYTE bitmap to the ≤7 window
  * ends it serves, and OR-merge per window — each day's raw events
  * are scanned exactly once no matter how many windows cover them.
  *
  * Scale shape: the event scan aggregates to |days| bitmap rows
  * (map-side-combined); the fan-out is a bounded 7× replication of
  * those rows (explode over the offset sequence — never over events);
  * the final merge groups ≤7 bitmaps per day. State ∝ |days|·|domain|/8
  * bits; for unbounded identity domains swap bitmap_or for
  * hll_union_agg (the stream_hll_distinct tier) with the same plan
  * shape. The left-semi against real days drops the phantom windows
  * past the horizon.
  */
object RollingDistinct {

  def qRollingDistinct(spark: SparkSession, sfDir: String,
                       maxId: Int = 1 << 20): DataFrame = {
    val perDay = Analytics.loadEvents(spark, sfDir)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day")
      .agg(GraftFunctions.bitmap_build(col("user_id"), maxId).as("bm"))
      .localCheckpoint() // feeds the fan-out AND the real-days filter

    val fanned = perDay
      .select(col("day"), col("bm"), explode(sequence(lit(0), lit(6))).as("off"))
      .select(date_add(col("day"), col("off")).as("day"), col("bm"),
        (col("off") === 0).as("is_own"))

    fanned.groupBy("day")
      .agg(
        GraftFunctions.bitmap_or_count(when(col("is_own"), col("bm"))).as("n_distinct_1d"),
        GraftFunctions.bitmap_or_count(col("bm")).as("n_distinct_7d"))
      .join(perDay.select("day"), Seq("day"), "left_semi")
      .orderBy("day")
  }

  /** DuckDB oracle: the quadratic-rescan formulation (join every day
    * against its trailing week of raw events) — the semantics, not
    * the plan.
    */
  val oracleSql: String =
    """WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
      |days AS (SELECT DISTINCT day FROM e)
      |SELECT d.day AS day,
      |  CAST(count(DISTINCT CASE WHEN e.day = d.day THEN user_id END) AS BIGINT) AS n_distinct_1d,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_7d
      |FROM days d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
