package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal table maintenance over `events` (SURVEY.md §2b): the two
  * canonical warehouse shapes the relational surface still lacked —
  * slowly-changing-dimension (type 2) history built from a change
  * log, and time-series gap-fill with last-observation-carried-
  * forward.
  *
  * Both are single-exchange plans. Every step — run detection,
  * run aggregation, validity chaining, gap generation — keys on
  * `user_id` or a superset of it, so Catalyst plans ONE hash
  * exchange on user_id and every later Window/Aggregate reuses it
  * (`HashPartitioning(user_id)` satisfies the clustered distribution
  * of `(user_id, …)` operators). At 100 TB the change log shuffles
  * once; there is no self-join and no second pass over the input.
  * Time arithmetic is exact integer microseconds throughout, so the
  * DuckDB oracle hash-matches bit-for-bit.
  */
object Timeline {

  private val HourUs = 3600000000L // 1 hour in microseconds
  // epoch micros of 2024-01-01T00:00:00Z, the corpus epoch — hour
  // indices are exact integer divisions from it, stable across
  // engines (calendar date_trunc is not).
  private val BaseUs = 1704067200000000L

  /** SCD type-2 history: treat each user's event stream as a change
    * log of their `event_type` state and compress consecutive
    * same-state runs into versioned validity intervals
    * `[valid_from_us, valid_to_us)`, open (null / is_current) for
    * the last run.
    *
    * The run boundary is a `lag` comparison, the version number a
    * running sum of boundaries, the run collapse a groupBy on
    * (user_id, version), and the interval chaining a `lead` of the
    * next run's start — four operators, one exchange, because all
    * four cluster on user_id. Ordering is total ((te, event_id);
    * event_id is unique) so the running sum has no peer-row
    * ambiguity.
    */
  def qScd2(spark: SparkSession, sfDir: String): DataFrame = {
    val byUserTime = Window.partitionBy("user_id").orderBy("te", "event_id")
    val byUserVersion = Window.partitionBy("user_id").orderBy("version")
    Analytics.loadEvents(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        col("event_type").as("state"), unix_micros(col("ts")).as("te"))
      .withColumn("chg",
        when(lag("state", 1).over(byUserTime).isNull ||
          lag("state", 1).over(byUserTime) =!= col("state"), 1L).otherwise(0L))
      .withColumn("version", sum("chg").over(byUserTime))
      .groupBy("user_id", "version")
      .agg(
        // state is constant within a run; min() collapses it without
        // carrying a first()'s ordering sensitivity through the agg
        min("state").as("state"),
        min("te").as("valid_from_us"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to_us", lead("valid_from_us", 1).over(byUserVersion))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select("user_id", "version", "state", "valid_from_us",
        "valid_to_us", "is_current", "n_events")
      .orderBy("user_id", "version")
  }

  /** Per-user event-type transition matrix (the behavioral Markov
    * chain): consecutive-event bigrams via `lag` over the SAME total
    * (te, event_id) order as qScd2, rolled up to (from_type, to_type)
    * counts and row-normalized probabilities. The lag window shuffles
    * on user_id once; the matrix rollup is a map-side-combined
    * aggregate to |types|² rows, and the probability is one IEEE
    * division of exact counts — bit-identical cross-engine.
    */
  def qTransition(spark: SparkSession, sfDir: String): DataFrame = {
    val byUserTime = Window.partitionBy("user_id").orderBy("te", "event_id")
    val byFrom = Window.partitionBy("from_type")
    Analytics.loadEvents(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        col("event_type").as("to_type"), unix_micros(col("ts")).as("te"))
      .withColumn("from_type", lag("to_type", 1).over(byUserTime))
      .filter(col("from_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") / sum("n").over(byFrom))
      .orderBy("from_type", "to_type")
  }

  /** Hourly resample with LOCF: one row per (user, hour) from the
    * user's first to last active hour, carrying the last observed
    * hourly value across silent hours.
    *
    * The classic formulation — calendar spine LEFT JOIN observations,
    * then `last(value, ignoreNulls)` — costs a join exchange. This
    * plan generates the gap rows FROM the observations instead: each
    * observed bucket emits `sequence(h, next_h - 1)` with its value,
    * so the carry-forward is built into the explode and the whole
    * query is the groupBy's single exchange. Per-user spine length is
    * bounded by the retention horizon (here the corpus's 30-day
    * window, ≤ 720 rows/user), which is what bounds it at 100 TB too.
    * The filled value is a bare `max` of observed doubles — no
    * arithmetic — so it hash-matches DuckDB exactly.
    */
  def qGapfill(spark: SparkSession, sfDir: String): DataFrame = {
    val byUserHour = Window.partitionBy("user_id").orderBy("h")
    Analytics.loadEvents(spark, sfDir)
      .select(col("user_id"),
        expr(s"((unix_micros(ts) - ${BaseUs}L) div ${HourUs}L)").as("h"),
        col("value"))
      // repartition on user_id BEFORE the (user_id, h) groupBy so the
      // aggregate, the lead window, and the explode all reuse one
      // user_id exchange instead of hashing on (user_id, h) first and
      // re-shuffling for the window
      .repartition(col("user_id"))
      .groupBy("user_id", "h")
      .agg(max("value").as("v"), count(lit(1)).as("n_obs"))
      .withColumn("next_h", lead("h", 1).over(byUserHour))
      .select(col("user_id"), col("h"), col("v"), col("n_obs"),
        explode(sequence(col("h"),
          coalesce(col("next_h") - 1, col("h")))).as("hour_idx"))
      .select(
        col("user_id"),
        col("hour_idx"),
        when(col("hour_idx") === col("h"), col("n_obs")).otherwise(0L).as("n_obs"),
        col("v").as("value_filled"),
        (col("hour_idx") === col("h")).as("is_observed"))
      .orderBy("user_id", "hour_idx")
  }
}
