package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-funnel and cohort-retention analytics over `events`
  * (SURVEY.md §2b) — the two canonical product-analytics shapes the
  * relational surface still lacked.
  *
  * Both are deliberately single-key-shuffle plans: every per-user
  * quantity (step times, cohort week) is computed with window
  * functions over the SAME `partitionBy(user_id)` spec, so Catalyst
  * plans ONE exchange on user_id and stacks the Window operators on
  * top of it — at 100 TB the events table shuffles once, and the
  * final aggregate is a few-row reduction with map-side combine.
  * Time arithmetic is exact integer microseconds (no doubles, no
  * transcendentals) so the DuckDB oracle hash-matches bit-for-bit.
  */
object Funnel {

  private val WeekUs = 604800000000L // 7 days in microseconds
  // epoch micros of 2024-01-01T00:00:00Z, the corpus epoch — week
  // indices are floor((t - base) / week) so they are stable across
  // scale factors rather than ISO-calendar-dependent.
  private val BaseUs = 1704067200000000L

  /** Three-step ordered funnel signup → view → purchase, each step
    * within 7 days of the PREVIOUS step's first occurrence. Step
    * times chain (t2 depends on t1, t3 on t2), which a single
    * aggregate cannot express; three stacked Window operators over
    * the same partitioning express it with one shuffle. The
    * one-row-per-user cut is a `row_number() = 1` filter over the
    * SAME partition spec — not `distinct()` — so it rides the
    * existing exchange instead of adding one.
    */
  def qFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    val firstRow = Window.partitionBy("user_id").orderBy("event_id")
    Analytics.loadEvents(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("te"))
      .withColumn("t1",
        min(when(col("event_type") === "signup", col("te"))).over(byUser))
      .withColumn("t2",
        min(when(col("event_type") === "view" &&
          col("te") > col("t1") && col("te") <= col("t1") + WeekUs,
          col("te"))).over(byUser))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" &&
          col("te") > col("t2") && col("te") <= col("t2") + WeekUs,
          col("te"))).over(byUser))
      .withColumn("rn", row_number().over(firstRow))
      .filter(col("rn") === 1)
      .agg(
        count(lit(1)).as("n_users"),
        count(col("t1")).as("u_signup"),
        count(col("t2")).as("u_view"),
        count(col("t3")).as("u_purchase"),
        min(col("t1")).as("first_signup_us"),
        max(col("t3")).as("last_purchase_us"))
  }

  /** Trailing 1-hour per-user event window via a RANGE frame — the
    * frame type `rowsBetween` queries can't express (peer rows with
    * equal order keys enter the frame together; the bound is a VALUE
    * offset, not a row count). Exact integer µs as the order key, the
    * floor-rounding rule on the float sum.
    */
  def qRangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val hourUs = 3600000000L
    val w = Window.partitionBy("user_id").orderBy("te")
      .rangeBetween(-hourUs, Window.currentRow)
    Analytics.loadEvents(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("te"), col("value"))
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_win", floor(sum("value").over(w) * 100 + 0.5) / 100)
      .select("user_id", "event_id", "n_win", "sum_win")
      .orderBy("user_id", "event_id")
  }

  /** Weekly cohort retention: cohort = week index of a user's first
    * event (any type), one output cell per (cohort_week, week_offset)
    * counting distinct users active that week. Week index is exact
    * integer division from the corpus epoch — `date_trunc('week')`
    * semantics differ across engines; arithmetic weeks do not.
    */
  def qRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    Analytics.loadEvents(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("te"))
      // `div` = exact long division (Column `/` would route through
      // double); operands are non-negative so trunc == floor.
      .select(col("user_id"), expr(s"(te - ${BaseUs}L) div ${WeekUs}L").as("wk"))
      .withColumn("cohort_week", min("wk").over(byUser))
      .select(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"),
        col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }
}
