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

  def qLateralTopK(spark: SparkSession, sfDir: String): DataFrame = {
    // per-call view names: fixed session-global names would mutate
    // shared catalog state and race under concurrent queries in one
    // session; the views are dropped once the plan is resolved (the
    // returned DataFrame holds the analyzed plan, not the view names)
    val sfx = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val nationV = s"graft_lat_nation_$sfx"
    val customerV = s"graft_lat_customer_$sfx"
    spark.read.parquet(s"$sfDir/nation.parquet").createOrReplaceTempView(nationV)
    spark.read.parquet(s"$sfDir/customer.parquet").createOrReplaceTempView(customerV)
    try {
      spark.sql(s"""
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM $nationV n, LATERAL (
          SELECT c_custkey, c_acctbal FROM $customerV c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""")
    } finally {
      spark.catalog.dropTempView(nationV)
      spark.catalog.dropTempView(customerV)
      ()
    }
  }
}
