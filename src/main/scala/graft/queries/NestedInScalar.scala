package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H Q20-shaped "potential part promotion" (SURVEY.md §2b) — the
  * TWO-LEVEL nested-IN decorrelation class (round-11 verdict #2): an
  * IN subquery that itself contains BOTH another IN (parts by name
  * prefix) and a CORRELATED scalar aggregate (the shipped-quantity
  * threshold for exactly that (part, supplier) pair), two levels deep.
  *
  * The testdata has no partsupp, so "availability" is derived from
  * lineitem history: an offer's availqty is the quantity the pair
  * shipped BEFORE 1996, and the pair qualifies when that stock exceeds
  * half of what it shipped DURING 1996 (disjoint windows — the
  * predicate is selective in both directions, unlike total-vs-subset
  * which is vacuously true). Quantities are integer-valued, so 0.5 ×
  * an exact integer sum is exact in both engines; a pair with no 1996
  * shipments yields a NULL scalar and is filtered — Q20's own
  * sum-over-empty semantics.
  *
  * What the optimizer must do with it (PlanAuditSpec pins both):
  *  - both IN levels become LEFT-SEMI hash joins (never IN-as-filter
  *    re-executed per row);
  *  - the correlated scalar aggregate decorrelates into a per-pair
  *    aggregate + equi join on (partkey, suppkey) — no nested loop,
  *    no cartesian product.
  *
  * At 100 TB: two disjoint date-pruned scans of the fact, each
  * map-side-combined to |pairs| rows; the part-name IN is a broadcast
  * semi join; supplier/nation close the plan by key. DuckDB runs the
  * SAME SQL text as the oracle.
  */
object NestedInScalar {

  def sql(lineitem: String, part: String, supplier: String,
          nation: String): String =
    s"""WITH offers AS (
       |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
       |    CAST(sum(l_quantity) AS BIGINT) AS ps_availqty
       |  FROM $lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
       |  GROUP BY l_partkey, l_suppkey
       |)
       |SELECT s.s_name, n.n_name
       |FROM $supplier s, $nation n
       |WHERE s.s_suppkey IN (
       |    SELECT ps.ps_suppkey FROM offers ps
       |    WHERE ps.ps_partkey IN (SELECT p_partkey FROM $part WHERE p_name LIKE 'small%')
       |      AND ps.ps_availqty > (
       |        SELECT 0.5 * sum(l.l_quantity) FROM $lineitem l
       |        WHERE l.l_partkey = ps.ps_partkey AND l.l_suppkey = ps.ps_suppkey
       |          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
       |          AND l.l_shipdate < TIMESTAMP '1997-01-01'))
       |  AND s.s_nationkey = n.n_nationkey
       |  AND n.n_name IN ('NATION_3','NATION_8','NATION_13')
       |ORDER BY s.s_name""".stripMargin

  def qNestedInScalar(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "lineitem" -> spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "part" -> spark.read.parquet(s"$sfDir/part.parquet"),
      "supplier" -> spark.read.parquet(s"$sfDir/supplier.parquet"),
      "nation" -> spark.read.parquet(s"$sfDir/nation.parquet"))) { v =>
      spark.sql(sql(v("lineitem"), v("part"), v("supplier"), v("nation")))
    }
}
