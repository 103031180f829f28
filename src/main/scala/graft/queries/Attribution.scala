package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch revenue attribution (SURVEY.md §2b) — the marketing-
  * analytics operator next to the funnel: every purchase distributes
  * its value over the user's preceding touches (views/clicks) inside
  * a 7-day lookback, under BOTH canonical models at once:
  * last-touch (the latest touch takes everything) and linear (equal
  * split). Output is the per-channel rollup.
  *
  * Exactness discipline: money moves as CENTS (`floor(v·100 + ½)` —
  * one IEEE formula both engines reproduce), the linear split is
  * integer division `cents div n` with the REMAINDER credited to the
  * earliest touch (deterministic, sums exactly to the purchase — no
  * float allocation that drifts by a cent), ties on touch time break
  * by event_id. Every output number is a BIGINT.
  *
  * Scale shape: ONE user-keyed time-range join (purchase × touch
  * within the lookback — the stream_stream_join batch shape; pair
  * volume is bounded by touches-per-user-week, not corpus size), then
  * per-purchase windows (count / rank by recency / rank by age) over
  * the purchase key, then a map-side-combined channel rollup. No
  * driver-side allocation loop — credit is a per-row expression.
  */
object Attribution {

  private val LookbackUs = 7L * 86400000000L

  def qAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Analytics.loadEvents(spark, sfDir)
      .withColumn("t", unix_micros(col("ts")))
    val touches = events
      .filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_type").as("channel"),
        col("t").as("tt"), col("event_id").as("touch_id"))
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t").as("tp"),
        col("event_id").as("purchase_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))

    val pairs = purchases.join(touches, Seq("user_id"))
      .filter(col("tt") <= col("tp") && col("tp") - col("tt") <= LookbackUs)

    val byPurchase = Window.partitionBy("purchase_id")
    val recency = Window.partitionBy("purchase_id")
      .orderBy(col("tt").desc, col("touch_id").desc)

    // (tt, touch_id) is a total order, so the earliest touch is simply
    // rk_new == n — one recency sort serves both models; a second
    // age-ordered window would re-sort every purchase partition.
    val credited = pairs
      .withColumn("n", count(lit(1)).over(byPurchase))
      .withColumn("rk_new", row_number().over(recency))
      .withColumn("lt_cents", when(col("rk_new") === 1, col("cents")).otherwise(lit(0L)))
      .withColumn("lin_cents",
        expr("cents div n") +
          when(col("rk_new") === col("n"), expr("cents % n")).otherwise(lit(0L)))

    credited.groupBy("channel")
      .agg(
        countDistinct("purchase_id").as("n_purchases_touched"),
        count(lit(1)).as("n_touches"),
        sum("lt_cents").as("last_touch_cents"),
        sum("lin_cents").as("linear_cents"))
      .orderBy("channel")
  }
}
