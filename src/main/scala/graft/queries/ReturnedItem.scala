package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H Q10 shape (SURVEY.md §2b) — "returned item reporting": the
  * top-k CUSTOMER report — revenue lost to returned lineitems in one
  * quarter, grouped by the full customer identity (key, name,
  * balance, nation, segment) and cut to the top 20 by revenue. The
  * defining plan property is the LIMIT over an aggregate of a
  * four-table join: the sort must be a TakeOrdered (per-partition
  * top-k then a 20-row driver merge), NEVER a full global sort of
  * |customers| rows — at 100 TB the difference between a 20-row
  * driver hand-off and a cluster-wide sort stage (spec-pinned).
  *
  * The returnflag filter prunes lineitem at the scan and the
  * order-date window prunes orders BEFORE the customer join; nation
  * broadcasts. Revenue in exact 10⁻⁴-dollar BIGINT units, ONE
  * cast-to-double division, so the DESC sort key is bit-identical
  * across engines; c_custkey breaks ties for a total order under the
  * LIMIT. DuckDB runs the SAME SQL text.
  */
object ReturnedItem {

  def sql(lineitem: String, orders: String, customer: String,
          nation: String): String =
    s"""SELECT c.c_custkey, c.c_name,
       |  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
       |    (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE)
       |    / 10000 AS revenue,
       |  c.c_acctbal, n.n_name, c.c_mktsegment
       |FROM $customer c, $orders o, $lineitem l, $nation n
       |WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
       |  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
       |  AND o.o_orderdate < TIMESTAMP '1997-04-01'
       |  AND l.l_returnflag = 'R'
       |  AND c.c_nationkey = n.n_nationkey
       |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  def qReturnedItem(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "lineitem" -> spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "orders" -> spark.read.parquet(s"$sfDir/orders.parquet"),
      "customer" -> spark.read.parquet(s"$sfDir/customer.parquet"),
      "nation" -> spark.read.parquet(s"$sfDir/nation.parquet"))) { v =>
      spark.sql(sql(v("lineitem"), v("orders"), v("customer"), v("nation")))
    }
}
