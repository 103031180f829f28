package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Correlated LATERAL subquery surface (SURVEY.md §2b): top-2
  * customers by balance PER NATION written as the SQL a user actually
  * writes — `FROM nation, LATERAL (SELECT … WHERE correlated ORDER BY
  * … LIMIT 2)` — and executed the way a 100 TB engine must: Catalyst
  * DECORRELATES the per-row subquery (DecorrelateInnerQuery +
  * RewriteLateralSubquery) into one broadcast join over a
  * `WindowGroupLimit` pre-cut, so customer is scanned ONCE with
  * map-side top-k pruning instead of once per nation row. The spec
  * pins that plan shape (WindowGroupLimit present, no nested-loop
  * re-execution per outer row) — the difference between an engine
  * that supports the syntax and one that scales it.
  */
object Lateral {

  def qLateralTopK(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "nation" -> spark.read.parquet(s"$sfDir/nation.parquet"),
      "customer" -> spark.read.parquet(s"$sfDir/customer.parquet"))) { v =>
      spark.sql(s"""
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM ${v("nation")} n, LATERAL (
          SELECT c_custkey, c_acctbal FROM ${v("customer")} c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""")
    }
}
