package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H Q21 decorrelation class (SURVEY.md §2b) — "suppliers who
  * kept orders waiting": the double-correlated EXISTS + NOT EXISTS
  * against the SAME fact table with an INEQUALITY correlation
  * (`l2.l_suppkey <> l1.l_suppkey` on the same order) — the hardest
  * classic subquery-decorrelation shape a real user hits. The corpus
  * has no commit/receipt dates, so "late" is re-expressed on the
  * available columns: a returned lineitem (`l_returnflag = 'R'`) on a
  * finished order (`o_orderstatus = 'F'`). A supplier "kept the order
  * waiting" when it was the ONLY supplier with a returned line on a
  * multi-supplier order:
  *
  *   EXISTS     l2: same order, different supplier          (multi-supplier)
  *   NOT EXISTS l3: same order, different supplier, 'R'     (sole offender)
  *
  * The engine states the decorrelated form directly — EXISTS is a
  * LEFT SEMI join, NOT EXISTS a LEFT ANTI join, both EQUI on
  * l_orderkey with the inequality riding as the join's extra
  * condition — exactly the plan Catalyst's RewritePredicateSubquery
  * produces from the SQL text (the oracle keeps the EXISTS/NOT EXISTS
  * spelling, pinning that the two forms agree).
  *
  * Scale shape: the nation filter lands FIRST — candidates join the
  * broadcast (nation-filtered) supplier dim before any self-join, so
  * the semi/anti probes carry ~1/|nations| of the returned lines. All
  * three lineitem legs shuffle on l_orderkey alone (co-partitioned
  * SortMergeJoin; per-key work bounded by lines-per-order, never a
  * cartesian); orders arrives as a join on the same key. No
  * nested-loop anywhere — spec-pinned.
  */
object MultiExists {

  def qMultiExists(spark: SparkSession, sfDir: String,
                   nation: String = "NATION_7"): DataFrame = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
    val nat = spark.read.parquet(s"$sfDir/nation.parquet")
      .filter(col("n_name") === nation).select(col("n_nationkey"))

    // l1: this nation's returned lines — the dim filter cuts the
    // candidate set BEFORE the expensive self-joins
    val l1 = li.filter(col("l_returnflag") === "R")
      .join(broadcast(sup.join(broadcast(nat),
        sup("s_nationkey") === nat("n_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_suppkey"), col("s_name"))

    val other = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
    val otherLate = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))

    l1
      .join(ord, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(other, col("l_orderkey") === col("o2") &&
        col("s2") =!= col("l_suppkey"), "left_semi")
      .join(otherLate, col("l_orderkey") === col("o3") &&
        col("s3") =!= col("l_suppkey"), "left_anti")
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  /** The SAME semantics in correlated-subquery spelling — DuckDB
    * decorrelates this itself; agreement pins the rewrite.
    */
  val oracleSql: String =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM lineitem l1
      |JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |JOIN nation   ON n_nationkey = s_nationkey AND n_name = 'NATION_7'
      |WHERE l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 10""".stripMargin
}
