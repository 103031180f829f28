package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval COALESCE / union-length (SURVEY.md §2b) — merge each
  * user's overlapping time intervals into maximal disjoint spans and
  * measure the UNION length (billable-time, machine-uptime,
  * "total time on site" — naive sums double-count every overlap).
  * The islands identity generalized from points to INTERVALS: with
  * rows in (start) order, an interval begins a NEW merged span iff
  * its start exceeds the RUNNING MAX of all previous ends (a plain
  * max window, frame = unbounded-preceding to 1-preceding); the
  * running count of such breaks is the span id; one groupBy collapses
  * each span to (min start, max end). Touching intervals (gap = 0)
  * merge, per the spec-pinned tie rule `start > maxPrevEnd`.
  *
  * Shape: ONE user_id exchange feeds both stacked windows AND the
  * span groupBy AND the per-user rollup (the q_scd2 single-exchange
  * discipline, spec-pinned); exact integer µs everywhere — interval
  * ends are `te + 20 min` in µs arithmetic, union lengths exact
  * BIGINTs. No self-join, no explode: at 100 TB this costs one
  * shuffle of (user, start, end) triples.
  */
object IntervalMerge {

  private val HalfWidthUs = 10L * 60 * 1000000 // events become ±10-min intervals

  def qIntervalMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val iv = Analytics.loadEvents(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("te"))
      .select(col("user_id"), (col("te") - HalfWidthUs).as("s"),
        (col("te") + HalfWidthUs).as("e"))

    val byUser = Window.partitionBy("user_id").orderBy(col("s"), col("e"))
    val prevMax = max("e").over(
      byUser.rowsBetween(Window.unboundedPreceding, -1))

    iv.withColumn("brk",
        when(col("s") > coalesce(prevMax, lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("span", sum("brk").over(byUser))
      .groupBy("user_id", "span")
      .agg(min("s").as("ms"), max("e").as("me"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("me") - col("ms")).as("covered_us"),
        max(col("me") - col("ms")).as("longest_us"))
      .orderBy("user_id")
  }

  val oracleSql: String =
    """WITH iv AS (
      |  SELECT user_id, epoch_us(ts) - 600000000 AS s, epoch_us(ts) + 600000000 AS e
      |  FROM events
      |), b AS (
      |  SELECT user_id, s, e,
      |    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY user_id ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -9223372036854775808)
      |      THEN 1 ELSE 0 END AS brk
      |  FROM iv
      |), sp AS (
      |  SELECT user_id, s, e,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY s, e) AS span
      |  FROM b
      |), m AS (
      |  SELECT user_id, span, min(s) AS ms, max(e) AS me
      |  FROM sp GROUP BY 1, 2
      |)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_spans,
      |  CAST(sum(me - ms) AS BIGINT) AS covered_us,
      |  CAST(max(me - ms) AS BIGINT) AS longest_us
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin
}
