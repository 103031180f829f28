package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFM customer segmentation (SURVEY.md §2b) — the marketing-analytics
  * staple: score every customer by Recency (latest order date),
  * Frequency (order count), and Monetary (exact lifetime cents), cut
  * each score into quartiles, and report the segment census — how many
  * customers are "4/4/4" vs "1/1/1".
  *
  * Determinism is the whole trick: `ntile` over a non-total order is
  * engine-lottery at quartile boundaries (two customers with equal
  * spend can land in different buckets depending on shuffle order), so
  * every ordering is made TOTAL with the customer key as tiebreaker —
  * then ntile is a pure function of the data and DuckDB lands every
  * boundary identically. Monetary sums in exact BIGINT cents
  * ([[Analytics.moneySum]] discipline); recency compares raw dates
  * (no interval arithmetic to drift).
  *
  * Scale shape: one map-side-combined aggregate reduces orders to one
  * row per customer; the three ntiles are single-partition windows
  * over |customers| rows — fine to ~10⁸ directly, and past that each
  * becomes a two-level quantile cut (approx_percentile boundaries +
  * a bucket join, the SeqPack prefix-sum discipline applied to
  * ranking). The census output is ≤ 4³ rows.
  */
object Rfm {

  def qRfm(spark: SparkSession, sfDir: String): DataFrame = {
    val perCust = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_custkey")
      .agg(
        max("o_orderdate").as("last_order"),
        count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100 + 0.5)).as("cents"))
    val r = Window.orderBy(col("last_order"), col("o_custkey"))
    val f = Window.orderBy(col("n_orders"), col("o_custkey"))
    val m = Window.orderBy(col("cents"), col("o_custkey"))
    perCust
      .withColumn("r_bucket", ntile(4).over(r))
      .withColumn("f_bucket", ntile(4).over(f))
      .withColumn("m_bucket", ntile(4).over(m))
      .groupBy("r_bucket", "f_bucket", "m_bucket")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("r_bucket", "f_bucket", "m_bucket")
  }
}
