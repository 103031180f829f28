package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** explode vs explode_outer (SURVEY.md §2b) — the empty-collection
  * row-loss trap of every unnest pipeline: `explode` generates zero
  * rows for an empty array, so entities with no elements VANISH from
  * downstream counts; `explode_outer` keeps them with a NULL element.
  * Built on a real empty-heavy collection: each order's array of
  * high-quantity lineitem quantities (qty > 45 — most orders have
  * none, so empties dominate), then BOTH generators run and their
  * censuses sit side by side: total rows, distinct surviving orders,
  * NULL elements. The declarative contract is pinned by the oracle
  * the way SQL expresses the same two semantics — inner unnest ==
  * plain inner join, outer unnest == preserved left join.
  *
  * Shape: the array build is one key-partitioned aggregate (the
  * filter pushes into the lineitem scan first); Generate is
  * per-partition streaming — no shuffle of its own; censuses are
  * map-side-combined single rows.
  */
object ExplodeOuter {

  def qExplodeOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val hi = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("q"))
    val arrs = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"))
      .join(hi, col("o_orderkey") === col("l_orderkey"), "left_outer")
      .groupBy("o_orderkey")
      .agg(sort_array(collect_list(col("q"))).as("qs")) // empty for no matches

    def census(exploded: DataFrame, op: String) =
      exploded.agg(count(lit(1)).as("n_rows"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          sum(when(col("q").isNull, 1L).otherwise(0L)).as("n_null_elems"))
        .select(lit(op).as("op"), col("n_rows"), col("n_orders"), col("n_null_elems"))

    census(arrs.select(col("o_orderkey"), explode(col("qs")).as("q")), "explode")
      .unionByName(
        census(arrs.select(col("o_orderkey"), explode_outer(col("qs")).as("q")),
          "explode_outer"))
      .orderBy("op")
  }

  /** The SQL meanings of the two generators: inner unnest == inner
    * join, outer unnest == preserved left join.
    */
  val oracleSql: String =
    """WITH hi AS (
      |  SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS q
      |  FROM lineitem WHERE l_quantity > 45
      |)
      |SELECT 'explode' AS op, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
      |  CAST(0 AS BIGINT) AS n_null_elems
      |FROM orders o JOIN hi ON o.o_orderkey = hi.l_orderkey
      |UNION ALL
      |SELECT 'explode_outer', CAST(count(*) AS BIGINT),
      |  CAST(count(DISTINCT o.o_orderkey) AS BIGINT),
      |  CAST(sum(CASE WHEN hi.q IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |FROM orders o LEFT JOIN hi ON o.o_orderkey = hi.l_orderkey
      |ORDER BY op""".stripMargin
}
