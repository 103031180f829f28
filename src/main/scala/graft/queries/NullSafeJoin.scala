package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Null-safe equality join (SURVEY.md §2b) — `<=>` / IS NOT DISTINCT
  * FROM vs `=`: under standard equality a NULL key matches NOTHING
  * (the predicate is UNKNOWN), so rows with NULL keys silently vanish
  * from an inner join — the enrichment-join twin of `q_not_in_null`'s
  * trap. The status column carries PLANTED NULLs and the label dim
  * contains an explicit NULL-keyed row; the SAME join runs under both
  * operators and the output census pins the divergence: `=` drops
  * every NULL-status order, `<=>` routes them to the NULL label.
  *
  * Shape: both joins broadcast the ≤4-row label dim; the census
  * aggregates map-side. Note the scale caveat pinned in the Scaladoc
  * rather than the plan: `<=>` keys make NULL a REAL join value, so
  * if NULLs are frequent they form a hot key — the q_salted_join /
  * null-split treatments apply exactly as for any other skewed value.
  */
object NullSafeJoin {

  def qNullSafeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(when(col("o_orderkey") % 13 === 6, lit(null))
        .otherwise(col("o_orderstatus")).as("st"))
    val labels = o.groupBy("st").agg(count(lit(1)).as("_n"))
      .select(col("st").as("st2"),
        concat(lit("L_"), coalesce(col("st2"), lit("NULL"))).as("label"))

    def census(joined: DataFrame, op: String) =
      joined.groupBy("label").agg(count(lit(1)).as("n"))
        .select(lit(op).as("op"), col("label"), col("n"))

    census(o.join(broadcast(labels), col("st") === col("st2")), "eq")
      .unionByName(
        census(o.join(broadcast(labels), col("st") <=> col("st2")), "null_safe"))
      .orderBy("op", "label")
  }

  val oracleSql: String =
    """WITH o AS (
      |  SELECT CASE WHEN o_orderkey % 13 = 6 THEN NULL ELSE o_orderstatus END AS st
      |  FROM orders
      |), labels AS (
      |  SELECT st AS st2, 'L_' || coalesce(st, 'NULL') AS label
      |  FROM o GROUP BY st
      |)
      |SELECT 'eq' AS op, label, CAST(count(*) AS BIGINT) AS n
      |FROM o JOIN labels ON st = st2 GROUP BY 2
      |UNION ALL
      |SELECT 'null_safe', label, CAST(count(*) AS BIGINT)
      |FROM o JOIN labels ON st IS NOT DISTINCT FROM st2 GROUP BY 2
      |ORDER BY op, label""".stripMargin
}
