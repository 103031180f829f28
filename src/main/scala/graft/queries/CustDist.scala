package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Customer order-count distribution (SURVEY.md §2b) — the TPC-H Q13
  * shape: how many customers placed 0, 1, 2, … qualifying orders. The
  * defining subtlety is the PRESERVED outer join: the order filter
  * must apply to the orders side BEFORE the join (Q13 puts it in the
  * join's ON clause) so zero-order customers survive with c_count = 0
  * instead of being dropped by a WHERE — the classic silently-wrong
  * rewrite this row pins.
  *
  * Shape: both sides hash-partition on the customer key for the
  * outer join, and the first aggregate (count per customer) groups on
  * the SAME key, so it reuses the join's partitioning — zero extra
  * exchange (spec-pinned: exactly 3 hash exchanges with broadcast off:
  * two join sides + the |distinct counts|-key second aggregate, whose
  * domain is tiny so map-side combine collapses it before the
  * shuffle). At 100 TB: one co-partitioned join + one bounded rollup,
  * no row ever visits a third shuffle.
  */
object CustDist {

  def qCustdist(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey")
    // the Q13 comment-filter analog on this schema: count only URGENT
    // orders, filtered BEFORE the outer join (keeps the zero bucket
    // populated at every SF — ~1/5 of orders qualify)
    val ords = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderpriority").like("%URGENT%"))
      .select("o_custkey", "o_orderkey")
    val perCust = cust
      .join(ords, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count")) // count skips the null side
    perCust.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val oracleSql: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      |  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      |  FROM customer c
      |  LEFT JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority LIKE '%URGENT%'
      |  GROUP BY 1
      |) GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin
}
