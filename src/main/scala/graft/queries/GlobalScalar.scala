package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H Q22-shaped "global customers" query (SURVEY.md §2b) — the
  * remaining decorrelation class next to [[Lateral]] (ORDER-BY-LIMIT),
  * [[ScalarSubquery]] (correlated scalar aggregate) and
  * [[ExistsSubquery]] (correlated predicate): an UNCORRELATED scalar
  * aggregate subquery (the global average balance of the positive
  * cohort) combined with NOT EXISTS and a substring-IN prefilter, in
  * ONE SQL text.
  *
  * What the optimizer must do with it (the spec pins all three):
  *  - the scalar subquery is executed ONCE and broadcast as a literal
  *    into the filter (exactly one SubqueryExec in the physical plan) —
  *    a per-row re-execution is the classic Q22 disaster at scale;
  *  - NOT EXISTS decorrelates to a LEFT-ANTI hash join against orders
  *    (one pass, no nested loop);
  *  - the substring-IN prefilter stays below the join.
  *
  * The reference data has no c_phone, so the country code is
  * `right(c_name, 2)` — same substring-IN shape on the columns that
  * exist; and EVERY customer here has orders, so Q22's "has placed no
  * orders" becomes "has placed no large order" (o_totalprice >
  * 400000) to keep the anti-join selective rather than vacuous.
  * Money crosses the engines as exact integer cents
  * (floor(v·100+½) — the repo-wide rule): the scalar comparison is
  * BIGINT-vs-exact-average and the output sum is integer cents divided
  * by 100.0 once, so both engines compute bit-identical doubles.
  *
  * DuckDB runs the SAME SQL text as the oracle — its own decorrelator,
  * same rows (the q_exists_subquery discipline).
  */
object GlobalScalar {

  /** The seven "country codes" (last-2-digit classes of c_name) with
    * the largest sf0.01 populations — arbitrary but fixed, like Q22's
    * seven phone prefixes.
    */
  private val Codes = "('06','09','12','31','55','56','68')"

  def sql(customer: String, orders: String): String =
    s"""SELECT cntrycode, count(*) AS numcust,
       |  CAST(sum(bal_cents) AS DOUBLE) / 100 AS totacctbal
       |FROM (
       |  SELECT right(c_name, 2) AS cntrycode, c_custkey,
       |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
       |  FROM $customer
       |  WHERE right(c_name, 2) IN $Codes
       |) c
       |WHERE bal_cents > (
       |    SELECT avg(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
       |    FROM $customer
       |    WHERE c_acctbal > 0.0 AND right(c_name, 2) IN $Codes)
       |  AND NOT EXISTS (SELECT 1 FROM $orders o
       |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
       |GROUP BY cntrycode
       |ORDER BY cntrycode""".stripMargin

  def qGlobalScalar(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "customer" -> spark.read.parquet(s"$sfDir/customer.parquet"),
      "orders" -> spark.read.parquet(s"$sfDir/orders.parquet"))) { v =>
      spark.sql(sql(v("customer"), v("orders")))
    }
}
