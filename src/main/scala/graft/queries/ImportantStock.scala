package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H Q11-shaped "important stock" (SURVEY.md §2b): a grouped
  * aggregate filtered against a FRACTION OF ITS OWN GLOBAL TOTAL — the
  * view-consumed-twice family next to [[TopRevenueView]] (Q15's global
  * MAX), here with TWO uncorrelated scalar subqueries over the same
  * CTE. Q11's `HAVING value > sum(value) × fraction` is re-expressed
  * EXACTLY: `value_u × (SELECT count(*)) > 2 × (SELECT sum(value_u))`
  * — the "worth more than 2× the average part" predicate in pure
  * integer arithmetic (a double `avg()` threshold would hand each
  * engine its own rounding at the boundary; the cross-multiplied form
  * has no boundary). The fixed fraction of the spec text is
  * deliberately NOT used: it de-selects to zero rows as the corpus
  * grows, whereas the average-relative form is scale-free.
  *
  * The testdata has no partsupp: stock value per part = Σ over
  * lineitem of cents × integral quantity, supplied by the two
  * audited nations — same value-per-part semantics on the relation
  * that exists.
  *
  * PlanAuditSpec pins: exactly TWO uncorrelated scalar subqueries
  * (each evaluated once, injected as literals), no nested loop.
  * At 100 TB: the CTE is one map-side-combined aggregate (|parts|
  * rows out); both scalars aggregate THAT, never a second fact scan;
  * the final sort is |qualifying parts|. DuckDB runs the SAME text.
  */
object ImportantStock {

  def sql(lineitem: String, supplier: String, nation: String): String =
    s"""WITH stock AS (
       |  SELECT l.l_partkey AS ps_partkey,
       |    sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
       |        * CAST(l.l_quantity AS BIGINT)) AS value_u
       |  FROM $lineitem l, $supplier s, $nation n
       |  WHERE l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
       |    AND n.n_name IN ('NATION_3','NATION_8')
       |  GROUP BY l.l_partkey
       |)
       |SELECT ps_partkey, CAST(value_u AS DOUBLE) / 100 AS stock_value
       |FROM stock
       |WHERE value_u * (SELECT count(*) FROM stock)
       |    > 2 * (SELECT sum(value_u) FROM stock)
       |ORDER BY value_u DESC, ps_partkey""".stripMargin

  def qImportantStock(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "lineitem" -> spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "supplier" -> spark.read.parquet(s"$sfDir/supplier.parquet"),
      "nation" -> spark.read.parquet(s"$sfDir/nation.parquet"))) { v =>
      spark.sql(sql(v("lineitem"), v("supplier"), v("nation")))
    }
}
