package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cohort retention/revenue matrix (SURVEY.md §2b) — the
  * growth-analytics staple next to [[Rfm]]: customers cohorted by
  * FIRST order month, every later order attributed to
  * (cohort, months-since-acquisition), each cell reporting distinct
  * returning customers and exact revenue. The diagonal-decay table
  * behind every retention curve.
  *
  * Determinism: month arithmetic is `year·12 + month` — exact
  * integers, no interval/months_between float semantics to drift
  * cross-engine; revenue is [[Analytics.moneySum]]'s BIGINT cents.
  *
  * Scale shape: the first-order table is one map-side-combined `min`
  * per customer; attributing orders joins back ON THE SAME KEY the
  * aggregate just partitioned by — co-partitioned, no second shuffle
  * of the fact side (and AQE broadcasts the cohort side when small).
  * The matrix itself is ≤ months² cells. The one genuinely expensive
  * term is the per-cell count(DISTINCT customer) — Spark plans it as
  * a two-level aggregate (distinct expand, then count), still
  * map-side-combined on the first level.
  */
object Cohort {

  private def ym(c: org.apache.spark.sql.Column) = year(c) * 12 + month(c)

  def qCohort(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val first = orders.groupBy("o_custkey").agg(min("o_orderdate").as("fd"))
    orders.join(first, "o_custkey")
      .select(
        ym(col("fd")).cast("int").as("cohort_m"),
        (ym(col("o_orderdate")) - ym(col("fd"))).cast("int").as("months_since"),
        col("o_custkey"), col("o_totalprice"))
      .groupBy("cohort_m", "months_since")
      .agg(
        countDistinct("o_custkey").as("n_customers"),
        Analytics.moneySum(col("o_totalprice")).as("revenue"))
      .orderBy("cohort_m", "months_since")
  }
}
