package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Correlated EXISTS / NOT EXISTS subqueries (SURVEY.md §2b) — the
  * third member of the decorrelation family next to [[Lateral]]
  * (ORDER-BY-LIMIT) and [[ScalarSubquery]] (scalar aggregate): the
  * predicate-subquery SQL a user writes, which Catalyst
  * (RewritePredicateSubquery) must decorrelate into LEFT-SEMI and
  * LEFT-ANTI hash joins — one pass over orders per predicate, never a
  * per-customer re-execution (the spec pins both join types present
  * and no nested loop). `q_semi_anti` already covers the DataFrame
  * semi/anti API; this row covers the SQL-text route to the same
  * plan — the difference between an engine with a semi-join operator
  * and one whose OPTIMIZER finds it in user SQL.
  *
  * DuckDB runs the SAME SQL text as the oracle — its own
  * decorrelator, same rows.
  */
object ExistsSubquery {

  def sql(customer: String, orders: String): String =
    s"""SELECT c_nationkey, count(*) AS n_picky
       |FROM $customer c
       |WHERE EXISTS (SELECT 1 FROM $orders o
       |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
       |  AND NOT EXISTS (SELECT 1 FROM $orders o2
       |                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
       |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  def qExistsSubquery(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "customer" -> spark.read.parquet(s"$sfDir/customer.parquet"),
      "orders" -> spark.read.parquet(s"$sfDir/orders.parquet"))) { v =>
      spark.sql(sql(v("customer"), v("orders")))
    }
}
