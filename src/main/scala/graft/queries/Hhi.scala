package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Market-concentration index (SURVEY.md §2b) — the Herfindahl–
  * Hirschman index of supplier revenue within each nation, in exact
  * integer arithmetic: HHI = Σᵢ shareᵢ², reported in basis points as
  * `(10000 · Σ rᵢ²) div R²` where rᵢ is supplier i's exact
  * 10⁻⁴-dollar revenue and R = Σ rᵢ. Entropy-based diversity needs a
  * transcendental log (whose libm last-ulp differences are exactly
  * what the repo's oracle rule bans); HHI is the RATIONAL
  * concentration metric — every step integral, one floor division,
  * bit-identical cross-engine.
  *
  * Overflow discipline (the q_corr rule): rᵢ ~ 10¹³ at warehouse
  * scale, so rᵢ² and R² live in DECIMAL(38,0) — each factor CAST
  * BEFORE multiplying (a BIGINT square would ANSI-throw); DuckDB's
  * side is plain HUGEINT.
  *
  * Shape: revenue rolls up map-side-combined onto (nation, supplier)
  * — one shuffle of the fact keyed by suppkey after a BROADCAST of
  * the supplier dim; the per-nation HHI re-reduces |suppliers| rows.
  * Two-level aggregation, no window, no self-join.
  */
object Hhi {

  private val d38 = "decimal(38,0)"

  def qHhi(spark: SparkSession, sfDir: String): DataFrame = {
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = spark.read.parquet(s"$sfDir/nation.parquet")
      .select(col("n_nationkey"), col("n_name"))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_suppkey"),
        (floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100 + 0.5).cast("long"))).as("r"))

    val perSupplier = li
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "s_suppkey")
      .agg(sum("r").as("r"))

    perSupplier
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("r").cast(d38)).as("rev"),
        sum(col("r").cast(d38) * col("r").cast(d38)).as("sumsq"))
      .select(col("n_name"), col("n_suppliers"),
        call_function("div", col("rev"), lit(10000L).cast(d38)).as("rev_cents"),
        call_function("div", lit(10000L).cast(d38) * col("sumsq"),
          col("rev") * col("rev")).as("hhi_bp"))
      .orderBy("n_name")
  }

  val oracleSql: String =
    """WITH per AS (
      |  SELECT n_name, l_suppkey,
      |    sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
      |        * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) AS r
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY 1, 2
      |)
      |SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
      |  CAST(sum(r) // 10000 AS BIGINT) AS rev_cents,
      |  CAST((10000 * sum(r * r)) // (sum(r) * sum(r)) AS BIGINT) AS hhi_bp
      |FROM per GROUP BY 1 ORDER BY 1""".stripMargin
}
