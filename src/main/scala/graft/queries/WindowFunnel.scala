package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-constrained funnel (SURVEY.md §2b) — the ClickHouse
  * `windowFunnel` class: how deep does signup → view → purchase get
  * when every later step must land within W hours OF THE FIRST step?
  * `q_funnel` orders steps but never bounds elapsed time, so a
  * January signup "converts" on a December purchase; conversion
  * windows are how funnels are actually specified.
  *
  * Semantics (deterministic, engine-neutral): for each signup event
  * at ts1, ts2 = the EARLIEST view in (ts1, ts1+W], ts3 = the
  * earliest purchase in (ts2, ts1+W]; depth = 1 + [ts2] + [ts3].
  * Taking the earliest qualifying step is the greedy choice that
  * maximizes remaining window, so depth is the true per-start
  * maximum. NULL propagation does the gating: a missing ts2 makes
  * the ts3 range predicate UNKNOWN, so depth can never skip a step.
  * Per user: starts, best depth, completed-funnel count.
  *
  * Scale shape: two LEFT range joins, both EQUI on user_id — the
  * range lives in the join's extra condition, so each is a
  * co-partitioned SortMergeJoin whose per-key work is bounded by
  * that user's activity (the sessionize bound), never a cartesian.
  * Each join collapses immediately via min() onto |starts| rows.
  * Interval arithmetic is pure seconds (no calendar), identical
  * cross-engine.
  */
object WindowFunnel {

  def qWindowFunnel(spark: SparkSession, sfDir: String, windowHours: Int = 48): DataFrame = {
    val ev = Analytics.loadEvents(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val w = expr(s"INTERVAL $windowHours HOURS")
    val s1 = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("ts1"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("uv"), col("ts").as("tsv"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("up"), col("ts").as("tsp"))

    val step2 = s1
      .join(v, col("user_id") === col("uv") &&
        col("tsv") > col("ts1") && col("tsv") <= col("ts1") + w, "left")
      .groupBy("user_id", "ts1").agg(min("tsv").as("ts2"))
    val step3 = step2
      .join(p, col("user_id") === col("up") &&
        col("tsp") > col("ts2") && col("tsp") <= col("ts1") + w, "left")
      .groupBy("user_id", "ts1", "ts2").agg(min("tsp").as("ts3"))

    step3
      .select(col("user_id"),
        (lit(1) + col("ts2").isNotNull.cast("int") + col("ts3").isNotNull.cast("int"))
          .as("depth"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_starts"),
        max("depth").cast("long").as("max_depth"),
        sum(when(col("depth") === 3, 1L).otherwise(0L)).as("n_full"))
      .orderBy("user_id")
  }

  val oracleSql: String =
    """WITH s1 AS (
      |  SELECT user_id, ts AS ts1 FROM events WHERE event_type = 'signup'
      |), s2 AS (
      |  SELECT s1.user_id, ts1, min(e.ts) AS ts2
      |  FROM s1 LEFT JOIN events e ON e.user_id = s1.user_id
      |    AND e.event_type = 'view'
      |    AND e.ts > ts1 AND e.ts <= ts1 + INTERVAL 48 HOURS
      |  GROUP BY 1, 2
      |), s3 AS (
      |  SELECT s2.user_id, ts1, ts2, min(e.ts) AS ts3
      |  FROM s2 LEFT JOIN events e ON e.user_id = s2.user_id
      |    AND e.event_type = 'purchase'
      |    AND e.ts > ts2 AND e.ts <= ts1 + INTERVAL 48 HOURS
      |  GROUP BY 1, 2, 3
      |), d AS (
      |  SELECT user_id,
      |    1 + CASE WHEN ts2 IS NOT NULL THEN 1 ELSE 0 END
      |      + CASE WHEN ts3 IS NOT NULL THEN 1 ELSE 0 END AS depth
      |  FROM s3
      |)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_starts,
      |  CAST(max(depth) AS BIGINT) AS max_depth,
      |  CAST(sum(CASE WHEN depth = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_full
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin
}
