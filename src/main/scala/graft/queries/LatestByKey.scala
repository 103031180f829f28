package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Latest-record-per-key (SURVEY.md §2b) — the "current snapshot"
  * pattern (last event per user, newest version per entity, freshest
  * quote per symbol), stated as an AGGREGATE, not a window: `max_by`
  * over a composite order struct collapses each key map-side — one
  * partial-aggregated shuffle of |keys| rows — where the textbook
  * `row_number() OVER (PARTITION BY k ORDER BY ts DESC) = 1`
  * formulation materializes and SORTS every event inside each hash
  * partition first. Same answer; at 100 TB the window's per-partition
  * sort (and the full-row shuffle it needs) is pure waste when only
  * the argmax row survives — the aggregate ships the winner per key
  * per partition and nothing else.
  *
  * Determinism: `ts` alone can tie; the order key is the struct
  * (ts, event_id) — event_id is unique, so the winner is total-order
  * deterministic in any engine (struct comparison is lexicographic).
  * The spec pins aggregate == window formulation row-for-row and the
  * plan shape (partial aggregation present, no Window/sort over the
  * fact).
  */
object LatestByKey {

  def qLatestByKey(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Analytics.loadEvents(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"))
    ev.groupBy("user_id")
      .agg(
        max_by(struct(col("event_type"), col("value"), col("ts")),
          struct(col("ts"), col("event_id"))).as("last"),
        count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("last.event_type").as("last_type"),
        // cents-exact money — the shared q1_agg rule, not a re-derivation
        Analytics.cents(col("last.value")).cast("long").as("last_value_cents"),
        unix_micros(col("last.ts")).as("last_ts_us"),
        col("n_events"))
      .orderBy("user_id")
  }

  /** Window spelling in DuckDB — the mechanism differs on purpose;
    * only the result is the contract.
    */
  val oracleSql: String =
    """WITH ranked AS (
      |  SELECT user_id, event_type, value, ts,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts DESC, event_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n_events
      |  FROM events
      |)
      |SELECT user_id, event_type AS last_type,
      |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS last_value_cents,
      |  epoch_us(ts) AS last_ts_us,
      |  CAST(n_events AS BIGINT) AS n_events
      |FROM ranked WHERE rn = 1 ORDER BY user_id""".stripMargin
}
