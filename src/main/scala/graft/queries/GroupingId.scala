package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GROUPING() disambiguation under rollup (SURVEY.md §2b) — the
  * correctness trap every subtotal report hits: a NULL in a rollup
  * output column means EITHER "this is the subtotal row" OR "the data
  * value really was NULL", and only `grouping()` can tell them apart.
  * The status column carries PLANTED real NULLs (orderkey%11=3,
  * replanted in the oracle), so the output contains BOTH kinds of
  * NULL cell — (st IS NULL, g_st=0) data groups and (st IS NULL,
  * g_st=1) subtotals — and any consumer that keys on the value alone
  * merges them wrongly (spec pins both present with different
  * counts). `gid = 2·g_pri + g_st` is the grouping_id bitmask built
  * from the per-column flags — pure integer arithmetic, identical
  * cross-engine.
  *
  * Shape: one scan, one Expand (3 grouping sets), one aggregate
  * exchange — rollup adds no join and no second pass; money in exact
  * BIGINT cents.
  */
object GroupingId {

  def qGroupingId(spark: SparkSession, sfDir: String): DataFrame = {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderpriority").as("pri"),
        when(col("o_orderkey") % 11 === 3, lit(null))
          .otherwise(col("o_orderstatus")).as("st"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))

    o.rollup("pri", "st")
      .agg( // grouping() is only resolvable inside the rollup aggregate
        grouping(col("pri")).cast("long").as("g_pri"),
        grouping(col("st")).cast("long").as("g_st"),
        count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .select(col("pri"), col("st"), col("g_pri"), col("g_st"),
        (col("g_pri") * 2 + col("g_st")).as("gid"),
        col("n"), col("sum_cents"))
      .orderBy(col("gid"), col("pri"), col("st"))
  }

  val oracleSql: String =
    """WITH o AS (
      |  SELECT o_orderpriority AS pri,
      |    CASE WHEN o_orderkey % 11 = 3 THEN NULL ELSE o_orderstatus END AS st,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders
      |)
      |SELECT pri, st,
      |  CAST(GROUPING(pri) AS BIGINT) AS g_pri,
      |  CAST(GROUPING(st) AS BIGINT) AS g_st,
      |  CAST(2 * GROUPING(pri) + GROUPING(st) AS BIGINT) AS gid,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM o GROUP BY ROLLUP (pri, st)
      |ORDER BY gid, pri, st""".stripMargin
}
