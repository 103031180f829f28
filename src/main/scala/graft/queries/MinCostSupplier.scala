package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H Q2-shaped "minimum-cost supplier" (SURVEY.md §2b) — the
  * correlated-scalar-MIN-over-a-multi-table-join decorrelation class
  * (round-11 verdict #2), completing the subquery matrix next to
  * [[ScalarSubquery]] (Q17), [[ExistsSubquery]] (Q4), [[GlobalScalar]]
  * (Q22), [[MultiExists]] (Q21) and [[GroupHavingIn]] (Q18): for every
  * qualifying part, keep exactly the regional supplier(s) whose offer
  * price equals the REGIONAL MINIMUM for that part — the correlated
  * subquery repeats the supplier→nation→region join inside the MIN.
  *
  * The testdata has no partsupp table, so the part-supplier offer
  * relation is derived (once, in a CTE both branches share) from
  * lineitem: an "offer" is the cheapest observed extended price per
  * (part, supplier), in exact integer cents — the repo-wide money
  * rule, so the min-equality is integer-exact in both engines.
  *
  * What the optimizer must do with it (PlanAuditSpec pins both):
  *  - decorrelate the scalar MIN into a per-part aggregate joined back
  *    on p_partkey — NEVER a per-part re-execution of the inner
  *    four-table join (the classic Q2 disaster: |parts| × that join);
  *  - every join stays an equi hash/merge join — no nested loop, no
  *    cartesian product anywhere in the physical plan.
  *
  * At 100 TB: the offers CTE is a map-side-combinable aggregate on
  * (partkey, suppkey); nation/region are broadcast dims; the
  * decorrelated min-per-part aggregate shuffles ids+cents only. DuckDB
  * runs the SAME SQL text as the oracle (its own decorrelator, same
  * rows — the q_global_scalar discipline).
  */
object MinCostSupplier {

  def sql(lineitem: String, part: String, supplier: String,
          nation: String, region: String): String =
    s"""WITH offers AS (
       |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
       |         min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS ps_supplycost
       |  FROM $lineitem GROUP BY l_partkey, l_suppkey
       |)
       |SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
       |  CAST(ps.ps_supplycost AS DOUBLE) / 100 AS supplycost
       |FROM $part p, $supplier s, offers ps, $nation n, $region r
       |WHERE p.p_partkey = ps.ps_partkey AND s.s_suppkey = ps.ps_suppkey
       |  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
       |  AND r.r_name = 'EUROPE' AND p.p_size <= 5 AND p.p_type = 'PROMO'
       |  AND ps.ps_supplycost = (
       |    SELECT min(ps2.ps_supplycost)
       |    FROM offers ps2, $supplier s2, $nation n2, $region r2
       |    WHERE ps2.ps_partkey = p.p_partkey AND s2.s_suppkey = ps2.ps_suppkey
       |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
       |      AND r2.r_name = 'EUROPE')
       |ORDER BY p.p_partkey, s.s_name""".stripMargin

  def qMinCostSupplier(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "lineitem" -> spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "part" -> spark.read.parquet(s"$sfDir/part.parquet"),
      "supplier" -> spark.read.parquet(s"$sfDir/supplier.parquet"),
      "nation" -> spark.read.parquet(s"$sfDir/nation.parquet"),
      "region" -> spark.read.parquet(s"$sfDir/region.parquet"))) { v =>
      spark.sql(sql(v("lineitem"), v("part"), v("supplier"),
        v("nation"), v("region")))
    }
}
