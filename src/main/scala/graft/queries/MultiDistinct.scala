package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multiple DISTINCT aggregates in ONE pass (SURVEY.md §2b) —
  * `count(DISTINCT user), count(DISTINCT day), count(DISTINCT type)`
  * per group, the everyday dashboard query whose naive plan is N
  * self-joined single-distinct aggregations. Spark (like every
  * columnar engine since Vertica) rewrites it to ONE scan via Expand:
  * each input row is replicated once per distinct column with a
  * grouping tag, then a two-level aggregate dedups (group, tag,
  * value) and counts per tag — N distincts for one shuffle of N·rows
  * tagged tuples instead of N shuffles of full rows. The spec pins
  * the Expand node and the single-subtree shape (no Union, no join
  * of sub-aggregations); the oracle just states the semantics.
  *
  * A plain count(*) rides along — Expand routes it through its own
  * null-tag branch, proving distinct and non-distinct aggregates
  * coexist in the one pass.
  */
object MultiDistinct {

  def qMultiDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Analytics.loadEvents(spark, sfDir)
      .select(col("event_type"), col("user_id"),
        to_date(col("ts")).as("day"),
        (col("user_id") % 16).as("shard"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct("user_id").as("n_users"),
        countDistinct("day").as("n_days"),
        countDistinct("shard").as("n_shards"))
      .orderBy("event_type")

  val oracleSql: String =
    """SELECT event_type, count(*) AS n_rows,
      |  count(DISTINCT user_id) AS n_users,
      |  count(DISTINCT CAST(ts AS DATE)) AS n_days,
      |  count(DISTINCT user_id % 16) AS n_shards
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
}
