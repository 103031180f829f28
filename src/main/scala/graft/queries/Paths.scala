package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral path analysis (SURVEY.md §2b): the top event-type
  * TRIGRAMS across all users' ordered event streams — the product-
  * analytics "what do users do next" operator (`q_transition` is its
  * first-order cut; trigrams expose the second-order structure a
  * Markov chain misses).
  *
  * Scale shape: ONE user_id exchange feeds both `lag` windows (the
  * stacked-window discipline of q_funnel/q_scd2), the trigram rollup
  * combines map-side onto at most |types|³ keys, and the top-k cut is
  * a `TakeOrderedAndProject`, never a full sort. The total order
  * within a user is (ts, event_id) — deterministic under ties.
  */
object Paths {

  def qPaths(spark: SparkSession, sfDir: String, k: Int = 15): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
    Analytics.loadEvents(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"),
        col("event_id"))
      .withColumn("p1", lag("event_type", 2).over(byUser))
      .withColumn("p2", lag("event_type", 1).over(byUser))
      .filter(col("p1").isNotNull)
      .groupBy(col("p1"), col("p2"), col("event_type").as("p3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("p1"), col("p2"), col("p3"))
      .limit(k)
  }
}
