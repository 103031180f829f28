package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The positional window family (SURVEY.md §2b) — `first_value` /
  * `last_value` / `nth_value` + IGNORE NULLS: "first order, latest
  * order, second order, first order with a usable value" per
  * customer. Two classic traps pinned: (1) `last_value` under the
  * DEFAULT frame (RANGE … CURRENT ROW) returns the CURRENT row, not
  * the partition's last — the full ROWS unbounded/unbounded frame is
  * load-bearing; (2) positional answers are only deterministic under
  * a TOTAL order — (o_orderdate, o_orderkey) breaks date ties, so
  * every function is reproducible cross-engine (the
  * q_percent_rank_cume discipline). IGNORE NULLS is exercised against
  * PLANTED nulls (price nulled at orderkey%5=0, replanted in the
  * oracle) so the skip path has a known non-trivial answer.
  *
  * Shape: all four functions share ONE Window node over one customer
  * exchange (spec-pinned); the one-row-per-customer cut is
  * `row_number = 1` riding the same sort. Money as exact BIGINT
  * cents.
  */
object FirstLast {

  def qFirstLast(spark: SparkSession, sfDir: String): DataFrame = {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("cents_gappy",
        when(col("o_orderkey") % 5 === 0, lit(null)).otherwise(col("cents")))

    val order = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    o.withColumn("first_cents", first_value(col("cents")).over(full))
      .withColumn("last_cents", last_value(col("cents")).over(full))
      .withColumn("second_cents", nth_value(col("cents"), 2).over(full))
      .withColumn("first_usable_cents",
        first_value(col("cents_gappy"), lit(true)).over(full))
      .withColumn("rn", row_number().over(order))
      .filter(col("rn") === 1)
      .select("o_custkey", "first_cents", "last_cents", "second_cents",
        "first_usable_cents")
      .orderBy("o_custkey")
  }

  val oracleSql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders
      |), w AS (
      |  SELECT o_custkey,
      |    first_value(cents) OVER win AS first_cents,
      |    last_value(cents) OVER win AS last_cents,
      |    nth_value(cents, 2) OVER win AS second_cents,
      |    first_value(CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE cents END
      |      IGNORE NULLS) OVER win AS first_usable_cents,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM o
      |  WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |)
      |SELECT o_custkey, first_cents, last_cents, second_cents,
      |  first_usable_cents
      |FROM w WHERE rn = 1 ORDER BY o_custkey""".stripMargin
}
