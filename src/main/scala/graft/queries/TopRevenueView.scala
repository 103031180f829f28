package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H Q15-shaped "top supplier by revenue view" (SURVEY.md §2b) —
  * the aggregate-of-aggregate decorrelation class (round-11 verdict
  * #2): a revenue VIEW (per-supplier revenue inside a 3-month window)
  * consumed twice in one statement — once as the join input, once
  * under a GLOBAL MAX in an uncorrelated scalar subquery — keeping
  * exactly the supplier(s) whose revenue equals the maximum.
  *
  * Revenue crosses the engines in exact integer units (cents ×
  * discount-percent units — the repo-wide discipline from q1/q3/q5):
  * the max-equality is integer-exact and the output dollars are ONE
  * IEEE division at the end, so both engines emit bit-identical
  * doubles. Ties (two suppliers at the max) are retained, exactly as
  * Q15's spec requires.
  *
  * What the optimizer must do with it (PlanAuditSpec pins both):
  *  - the scalar MAX executes ONCE (one uncorrelated ScalarSubquery /
  *    SubqueryExec), not per supplier row;
  *  - the supplier↔revenue join is an equi join — no nested loop, no
  *    cartesian product.
  *
  * At 100 TB: the view is one map-side-combinable aggregate over the
  * date-pruned fact (|suppliers| rows out); the MAX is an aggregate of
  * THAT — |suppliers| rows, not a second fact scan; supplier joins by
  * key. DuckDB runs the SAME SQL text as the oracle.
  */
object TopRevenueView {

  def sql(lineitem: String, supplier: String): String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |    sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
       |        (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS total_rev_u
       |  FROM $lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY l_suppkey
       |)
       |SELECT s.s_suppkey, s.s_name,
       |  CAST(r.total_rev_u AS DOUBLE) / 10000 AS total_revenue
       |FROM $supplier s, revenue r
       |WHERE s.s_suppkey = r.supplier_no
       |  AND r.total_rev_u = (SELECT max(total_rev_u) FROM revenue)
       |ORDER BY s.s_suppkey""".stripMargin

  def qTopRevenueView(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "lineitem" -> spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "supplier" -> spark.read.parquet(s"$sfDir/supplier.parquet"))) { v =>
      spark.sql(sql(v("lineitem"), v("supplier")))
    }
}
