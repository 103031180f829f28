package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical-moment and rank-bucket analytics (SURVEY.md §2b).
  *
  * Second-moment aggregates (stddev/covariance/correlation) are
  * single-pass partial aggregations in Spark — executors stream
  * central-moment states and the reduce merges them, so at 100 TB
  * the shuffle carries one small state row per (group × partition).
  * Rounding precision per column is chosen so the ≲1e-12 relative
  * difference between merge orders (Spark's partial-merge tree vs
  * DuckDB's) can never flip a printed digit.
  */
object Stats {

  /** Per-group exact MODE with a deterministic tie-break (most common
    * l_quantity per return flag; ties resolve to the smaller value) —
    * the aggregate SQL's MODE() gives nondeterministically, made
    * reproducible. Two map-side-combined counting levels, then a
    * `row_number ≤ 1` cut over (count DESC, value ASC) that runs as
    * WindowGroupLimit: no full per-group sort, and the second level
    * operates on (group, value) cardinality, not rows.
    */
  def qMode(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag")
      .orderBy(col("cnt").desc, col("l_quantity"))
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt"))
      .orderBy("l_returnflag")
  }

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Grouped sample stddev / covariance / correlation of lineitem
    * quantity vs price.
    */
  def qStatsMoments(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qp"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"))
      .orderBy("l_returnflag")

  /** Per-customer price quartiles via `ntile(4)` over a
    * HIGH-CARDINALITY partition key (a global-order ntile would pull
    * every row into one partition — the classic unpartitioned-window
    * scale bug), then a cross-customer reduction per quartile.
    */
  def qNtile(spark: SparkSession, sfDir: String): DataFrame = {
    val byCust = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    t(spark, sfDir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("quartile", ntile(4).over(byCust))
      .groupBy("quartile")
      .agg(
        count(lit(1)).as("n_orders"),
        Analytics.moneySum(col("o_totalprice")).as("total"),
        round(avg("o_totalprice"), 4).as("avg_price"))
      .orderBy("quartile")
  }
}
