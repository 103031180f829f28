package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Disjunctive predicate pushdown (SURVEY.md §2b) — the TPC-H Q19
  * shape: an OR-of-ANDs condition mixing columns of BOTH join sides
  * ("brand A in small sizes at low quantity, OR brand B mid, OR brand
  * C large"). Written naively this filters AFTER the join; the plan
  * that survives 100 TB extracts, per side, the disjunction of that
  * side's conjuncts — part gets `(brand∧size)₁ ∨ (brand∧size)₂ ∨ …`,
  * lineitem gets `qty₁ ∨ qty₂ ∨ …` — and pushes each below the join
  * into the scan, so non-qualifying rows die before the shuffle.
  * Catalyst's PushExtraPredicateThroughJoin does exactly this
  * inference from the declarative filter; the spec pins the extracted
  * OR-predicate in BOTH parquet scans' PushedFilters and the full
  * residual kept above the join (the per-side extraction is necessary,
  * not sufficient — cross-side pairs still need the original).
  *
  * Revenue is exact BIGINT-cents arithmetic (the moneySum family), so
  * the per-brand rollup hash-matches DuckDB.
  */
object OrPushdown {

  def qOrPushdown(spark: SparkSession, sfDir: String): DataFrame = {
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_brand", "p_size")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val cond =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 15)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10, 25)) ||
      (col("p_brand") === "Brand#5" && col("p_size").between(20, 50) &&
        col("l_quantity").between(25, 50))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        Analytics.moneyRevenueSum(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
      .orderBy("p_brand")
  }

  val oracleSql: String =
    """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
      |  ((sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) + 50) // 100) / 100.0 AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 25)
      |   OR (p_brand = 'Brand#5' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 25 AND 50)
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
