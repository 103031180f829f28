package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands (SURVEY.md §2b) — consecutive-day activity runs
  * per user (retention streaks, outage windows, sensor dropouts): the
  * classic grouping-by-difference identity. For each user's distinct
  * active days ordered by day index, `day_idx − row_number()` is
  * CONSTANT within a consecutive run and strictly increasing across
  * gaps — so one subtraction turns "find maximal consecutive runs"
  * into a plain groupBy, no iterative merging, no self-join on
  * day±1.
  *
  * Scale shape: distinct (user, day) collapse (map-side combined),
  * ONE user-partitioned window for row_number, groupBy (user, grp)
  * for the islands, then a per-user rollup — every step clusters on
  * user_id, so the whole query is one exchange (the q_scd2
  * discipline). All arithmetic is exact integer day indices.
  */
object Islands {

  private val DayUs = 86400000000L

  def qIslands(spark: SparkSession, sfDir: String): DataFrame = {
    val byUserDay = Window.partitionBy("user_id").orderBy("day_idx")
    Analytics.loadEvents(spark, sfDir)
      .select(col("user_id"),
        call_function("div", unix_micros(col("ts")), lit(DayUs)).as("day_idx"))
      .distinct()
      .repartition(col("user_id")) // one exchange serves window + both groupBys
      .withColumn("grp", col("day_idx") - row_number().over(byUserDay))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("run_len"),
        min("day_idx").as("run_start"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_islands"),
        max("run_len").as("longest_run"),
        sum("run_len").as("active_days"),
        min("run_start").as("first_day_idx"))
      .orderBy("user_id")
  }

  val oracleSql: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day_idx FROM events
      |), g AS (
      |  SELECT user_id, day_idx,
      |    day_idx - row_number() OVER (PARTITION BY user_id ORDER BY day_idx) AS grp
      |  FROM d
      |), runs AS (
      |  SELECT user_id, grp, count(*) AS run_len, min(day_idx) AS run_start
      |  FROM g GROUP BY 1, 2
      |)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
      |  CAST(max(run_len) AS BIGINT) AS longest_run,
      |  CAST(sum(run_len) AS BIGINT) AS active_days,
      |  CAST(min(run_start) AS BIGINT) AS first_day_idx
      |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin
}
