package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relative-rank window family (SURVEY.md §2b) — `rank`,
  * `dense_rank`, `percent_rank`, `cume_dist` over one ordering:
  * supplier revenue standing within nation, the "what percentile is
  * this vendor" query. Complements `q_window` (rank) and `q_ntile`
  * (bucketed) with the two RELATIVE members, whose cross-engine
  * exactness is subtle enough to pin: percent_rank = (rank−1)/(n−1)
  * and cume_dist = peers≤/n are each ONE correctly-rounded IEEE
  * division of exact integers — deterministic in any engine — so
  * round(6) hash-matches with no accumulation-order caveat. Revenue
  * is exact BIGINT cents (the money discipline); the rank ordering is
  * total (revenue desc, supplier), so every rank function is
  * tie-free-deterministic by construction.
  *
  * Scale shape: one map-side-combined revenue aggregate to supplier
  * grain, then ONE nation-partitioned sort serves all four window
  * functions (same frame, same ordering — Spark evaluates them in a
  * single Window operator; spec pins exactly one Window node and one
  * exchange).
  */
object RankFamily {

  def qPercentRankCume(spark: SparkSession, sfDir: String): DataFrame = {
    val byNation = Window.partitionBy("s_nationkey")
      .orderBy(desc("rev_cents"), col("s_suppkey"))
    val rev = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_suppkey"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("l_suppkey").agg(sum("cents").as("rev_cents"))
    spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey"), col("s_nationkey"))
      .join(rev, col("l_suppkey") === col("s_suppkey"))
      .select(
        col("s_nationkey"), col("s_suppkey"), col("rev_cents"),
        rank().over(byNation).cast("long").as("rnk"),
        dense_rank().over(byNation).cast("long").as("drnk"),
        round(percent_rank().over(byNation), 6).as("pr_r6"),
        round(cume_dist().over(byNation), 6).as("cd_r6"))
      .orderBy("s_nationkey", "rnk")
  }

  val oracleSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey, sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev_cents
      |  FROM lineitem GROUP BY 1
      |)
      |SELECT s_nationkey, s_suppkey, CAST(rev_cents AS BIGINT) AS rev_cents,
      |  CAST(rank() OVER w AS BIGINT) AS rnk,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |  round(percent_rank() OVER w, 6) AS pr_r6,
      |  round(cume_dist() OVER w, 6) AS cd_r6
      |FROM supplier JOIN rev ON l_suppkey = s_suppkey
      |WINDOW w AS (PARTITION BY s_nationkey ORDER BY rev_cents DESC, s_suppkey)
      |ORDER BY s_nationkey, rnk""".stripMargin
}
