package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calendar-semantics surface (SURVEY.md §2b) — `date_trunc` /
  * `year` / `quarter` / `month` agreement across engines. The
  * repo's time rows (retention, cohort, gapfill) deliberately use
  * exact integer µs arithmetic to DODGE calendar semantics; this row
  * pins the calendar functions themselves — month boundaries, year/
  * quarter extraction, day truncation — because a real warehouse
  * reports on calendar months, and "Spark's March == DuckDB's March"
  * is a contract that deserves its own oracle. Timestamps are
  * NTZ-naive UTC; the month key is serialized `yyyy-MM` (a STRING —
  * tz-annotation differences between engines' parquet/pandas
  * timestamp round-trips can't touch it).
  *
  * Shape: one scan, one aggregate on the month key (plus the distinct
  * active-days count riding the same pass via Expand); money in exact
  * BIGINT cents.
  */
object Calendar {

  def qCalendar(spark: SparkSession, sfDir: String): DataFrame = {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderdate").cast("timestamp").as("ts"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))

    o.select(date_format(date_trunc("month", col("ts")), "yyyy-MM").as("month"),
        year(col("ts")).cast("long").as("y"),
        quarter(col("ts")).cast("long").as("q"),
        month(col("ts")).cast("long").as("m"),
        date_trunc("day", col("ts")).as("day"),
        col("cents"))
      .groupBy("month", "y", "q", "m")
      .agg(count(lit(1)).as("n"),
        sum("cents").as("sum_cents"),
        countDistinct(col("day")).as("n_active_days"))
      .orderBy("month")
  }

  val oracleSql: String =
    """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
      |  CAST(year(o_orderdate) AS BIGINT) AS y,
      |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
      |  CAST(month(o_orderdate) AS BIGINT) AS m,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  CAST(count(DISTINCT date_trunc('day', o_orderdate)) AS BIGINT) AS n_active_days
      |FROM orders
      |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin
}
