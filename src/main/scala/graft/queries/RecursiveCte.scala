package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-text recursive CTE (SURVEY.md §2b) — the literal `WITH
  * RECURSIVE` route to the hierarchy closure [[Hierarchy.qHierarchy]]
  * resolves with pointer jumping: Spark 4's native recursive CTE
  * support (`UnionLoop`) runs the user's own recursion text, the
  * `q_exists_subquery` discipline applied to recursion — the
  * difference between an engine with a closure operator and one whose
  * PLANNER accepts the SQL a user actually writes. Same forest
  * (parent = node div 10 over the dense orders key space), same
  * (node, root, depth) result, and the oracle is DuckDB executing the
  * IDENTICAL text — two independent `WITH RECURSIVE` implementations
  * agreeing on the fixpoint.
  *
  * Scale note, measured not assumed (RecursiveCteSpec pins the shape):
  * the native route iterates the recursive term PER LEVEL — each
  * iteration re-joins the previous level against the edge relation, so
  * a depth-d hierarchy costs d scans of the (pruned, two-column) edge
  * projection. That is the right plan when depth is small and levels
  * are wide (this forest: depth ≈ log₁₀ n). For deep chains the
  * O(log depth) pointer-jumping operator `q_hierarchy` remains the
  * scale path; this row keeps the SQL-text surface honest, it does not
  * replace the operator.
  */
object RecursiveCte {

  /** Shared text: Spark runs it over temp views, DuckDB verbatim over
    * its parquet views. Integer division is spelled
    * `CAST(floor(x / 10) AS BIGINT)` — `div` is Spark-only, `//` is
    * DuckDB-only, while `/`-then-floor is exact in both engines for
    * the positive key space (doubles are exact far past any key).
    */
  def sql(orders: String): String =
    s"""WITH RECURSIVE r AS (
       |  SELECT o_orderkey AS node, o_orderkey AS root, 0 AS depth
       |  FROM $orders WHERE o_orderkey < 10
       |  UNION ALL
       |  SELECT o.o_orderkey AS node, r.root AS root, r.depth + 1 AS depth
       |  FROM $orders o JOIN r ON CAST(floor(o.o_orderkey / 10) AS BIGINT) = r.node
       |  WHERE o.o_orderkey >= 10
       |)
       |SELECT node, root, CAST(depth AS BIGINT) AS depth
       |FROM r ORDER BY node""".stripMargin

  def qRecursiveCte(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "orders" -> spark.read.parquet(s"$sfDir/orders.parquet"))) { v =>
      spark.sql(sql(v("orders")))
    }
}
