package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H Q12-shaped "shipping modes and order priority" (SURVEY.md
  * §2b): per shipping class, HOW MANY of its line items belong to
  * high-priority orders vs the rest — the two-way CASE-count split
  * (`sum(CASE WHEN priority IN (urgent, high) THEN 1 ELSE 0 END)` and
  * its complement) every operations dashboard runs. The corpus has no
  * l_shipmode, so the shipping class is the (l_returnflag,
  * l_linestatus) pair — same grouping arity, the columns that exist.
  *
  * Pure integer counts — no rounding surface at all; the join is one
  * key-partitioned fact-to-orders equi join with the aggregate
  * map-side-combined to ≤6 groups. DuckDB runs the SAME SQL text.
  */
object ShipPriority {

  def sql(lineitem: String, orders: String): String =
    s"""SELECT l.l_returnflag, l.l_linestatus,
       |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
       |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       |  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
       |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       |FROM $lineitem l, $orders o
       |WHERE o.o_orderkey = l.l_orderkey
       |  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l.l_shipdate < TIMESTAMP '1997-01-01'
       |GROUP BY l.l_returnflag, l.l_linestatus
       |ORDER BY l.l_returnflag, l.l_linestatus""".stripMargin

  def qShipPriority(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "lineitem" -> spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "orders" -> spark.read.parquet(s"$sfDir/orders.parquet"))) { v =>
      spark.sql(sql(v("lineitem"), v("orders")))
    }
}
