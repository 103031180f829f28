package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Correlated SCALAR-AGGREGATE subquery surface (SURVEY.md §2b) — the
  * TPC-H q17 shape, completing the decorrelation family next to
  * [[Lateral]]'s ORDER-BY-LIMIT class: "lineitems below 20% of their
  * part's average quantity" written as the SQL a user actually writes
  * (a correlated `(SELECT 0.2 * avg(..) WHERE l2.l_partkey =
  * p_partkey)` threshold in the WHERE clause), executed the way 100 TB
  * demands: Catalyst DECORRELATES the per-row subquery
  * (DecorrelateInnerQuery + RewriteCorrelatedScalarSubquery) into ONE
  * per-part aggregate over lineitem joined back to the probe side — a
  * hash-join plan with map-side partial aggregation, never a
  * re-execution of the subquery per outer row (an engine that
  * re-executes runs |outer| aggregations; the spec pins the
  * no-nested-loop shape). The small filtered `part` dimension rides a
  * broadcast join.
  *
  * Exactness: l_quantity is integral (sum exact in binary64 at any
  * parallelism, avg = one IEEE division), the 0.2·avg threshold and
  * the `<` compare are bit-identical cross-engine, and the money total
  * uses the BIGINT-cents rule ([[Analytics.moneySum]]). DuckDB runs
  * the SAME SQL text as the oracle — different decorrelator, same
  * rows.
  */
object ScalarSubquery {

  /** The one SQL text, shared verbatim by the Spark run and the DuckDB
    * oracle (table names resolve to temp views here, parquet files
    * there).
    */
  def sql(lineitem: String, part: String): String =
    // CAST(100 AS DOUBLE), not the literal 100.0: Spark SQL parses an
    // exact-numeric literal as DECIMAL and would return a DECIMAL total
    // where DuckDB returns DOUBLE — the one dialect divergence in this
    // shared text.
    s"""SELECT count(*) AS n_small,
       |  sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)) / CAST(100 AS DOUBLE) AS total_price
       |FROM $lineitem, $part
       |WHERE p_partkey = l_partkey
       |  AND p_brand = 'Brand#23'
       |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
       |                    FROM $lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  def qScalarSubquery(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "lineitem" -> spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "part" -> spark.read.parquet(s"$sfDir/part.parquet"))) { v =>
      spark.sql(sql(v("lineitem"), v("part")))
    }
}
