package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H Q18 shape (SURVEY.md §2b) — `IN` over a GROUPED + HAVING
  * subquery ("large-volume customers": orders whose total quantity
  * crosses a threshold), completing the subquery surface next to the
  * scalar-aggregate (q17 / `q_scalar_subquery`) and EXISTS
  * (`q_exists_subquery`) classes: here the semi-join key set is
  * itself the output of an aggregation, so the planner must stack
  * aggregate → semi join → join → re-aggregate without collapsing or
  * duplicating rows.
  *
  * Same-SQL-text discipline: Spark and DuckDB run the IDENTICAL
  * query. Quantities as exact BIGINTs (`floor(q+0.5)`), total-order
  * tiebreak on o_orderkey under the LIMIT.
  *
  * Scale shape: the HAVING subquery is one map-side-combined
  * aggregate of lineitem to order granularity (shuffle on the 8-byte
  * key, carries (key, sum) only); its semi join prunes orders BEFORE
  * the customer join (spec-pinned LeftSemi, no correlated re-scan);
  * the final TakeOrdered keeps 100 rows per partition off the
  * driver-bound sort.
  */
object GroupHavingIn {

  def sql(customer: String, orders: String, lineitem: String): String =
    s"""SELECT c_custkey, o_orderkey,
       |  CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS total_qty
       |FROM $customer
       |JOIN $orders ON c_custkey = o_custkey
       |JOIN $lineitem ON o_orderkey = l_orderkey
       |WHERE o_orderkey IN (
       |  SELECT l_orderkey FROM $lineitem GROUP BY l_orderkey
       |  HAVING sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) > 200)
       |GROUP BY c_custkey, o_orderkey
       |ORDER BY total_qty DESC, o_orderkey
       |LIMIT 100""".stripMargin

  def qGroupHavingIn(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "customer" -> spark.read.parquet(s"$sfDir/customer.parquet"),
      "orders" -> spark.read.parquet(s"$sfDir/orders.parquet"),
      "lineitem" -> spark.read.parquet(s"$sfDir/lineitem.parquet"))) { v =>
      spark.sql(sql(v("customer"), v("orders"), v("lineitem")))
    }
}
