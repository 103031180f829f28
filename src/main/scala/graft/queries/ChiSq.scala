package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact chi-square goodness-of-fit (SURVEY.md §2b) — the
  * hypothesis-test class in INTEGER arithmetic: is each nation's
  * order-priority mix consistent with the uniform distribution? The
  * standard statistic χ² = Σⱼ (Oⱼ − N/k)² / (N/k) is rational with a
  * per-nation common denominator, so it scales to an exact integer:
  * N·k·χ² = Σⱼ (Oⱼ·k − N)². The engine reports that scaled form plus
  * one floor division to milli-units — no float, no libm, the q_hhi
  * rationality rule applied to a test statistic. The 0.999 critical
  * value for dof = k−1 = 4 (18.467) is a literal, so the reject flag
  * is an exact integer comparison.
  *
  * ZERO CELLS COUNT: a priority a nation never uses contributes
  * (0·k − N)², so the cell grid is densified (nations observed in
  * the data × the global priority domain) before differencing —
  * dropping empty cells is the classic chi-square bug.
  *
  * Scale shape: the fact rolls up map-side onto (nation, priority)
  * — |nations|·k keys — after two broadcast dim joins; the grid
  * densification, totals join, and final reduce all run on that tiny
  * rollup. One fact scan, one shuffle of k·|nations| partial counts.
  * Overflow: cells are cast DECIMAL(38,0) before squaring (the q_hhi
  * rule) — BIGINT squares would ANSI-throw around N ~ 3·10⁹ — and the
  * scaled statistic STAYS exact to the output boundary: it can reach
  * N²·k·(k−1) (past int64 near N ≈ 6.8·10⁸ orders/nation, i.e. well
  * inside 100 TB territory), so it is emitted as the DECIMAL's exact
  * digit string, never narrowed through a silent long cast. The
  * decision-grade value (`chisq_milli`, ~1000·χ²) is small and stays
  * BIGINT.
  */
object ChiSq {

  private val d38 = "decimal(38,0)"

  def qChiSq(spark: SparkSession, sfDir: String): DataFrame = {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"), col("o_orderpriority").as("p"))
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey"))
    val nat = spark.read.parquet(s"$sfDir/nation.parquet")
      .select(col("n_nationkey"), col("n_name"))

    val cnt = o
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "p").agg(count(lit(1)).as("o"))

    val pri = cnt.select("p").distinct()
    val grid = cnt.select("n_name").distinct().crossJoin(pri)
    val full = grid.join(broadcast(cnt), Seq("n_name", "p"), "left")
      .select(col("n_name"), col("p"), coalesce(col("o"), lit(0L)).as("o"))
    val tot = full.groupBy("n_name")
      .agg(sum("o").as("n"), count(lit(1)).as("k"))

    full.join(broadcast(tot), "n_name")
      .select(col("n_name"), col("n"), col("k"),
        (col("o").cast(d38) * col("k").cast(d38) - col("n").cast(d38)).as("d"))
      .groupBy("n_name")
      .agg(first("n").as("n_orders"),
        sum(col("d") * col("d")).as("sc"),
        first(col("n").cast(d38) * col("k").cast(d38)).as("nk"))
      .select(col("n_name"), col("n_orders"),
        col("sc").cast(d38).cast("string").as("chisq_scaled"),
        call_function("div", lit(1000L).cast(d38) * col("sc"), col("nk"))
          .as("chisq_milli"))
      .withColumn("uniform_rejected", col("chisq_milli") > 18467L)
      .orderBy("n_name")
  }

  val oracleSql: String =
    """WITH cnt AS (
      |  SELECT n_name, o_orderpriority AS p, count(*) AS o
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2
      |), grid AS (
      |  SELECT n_name, p
      |  FROM (SELECT DISTINCT n_name FROM cnt) CROSS JOIN (SELECT DISTINCT p FROM cnt)
      |), fullg AS (
      |  SELECT g.n_name, g.p, coalesce(o, 0) AS o
      |  FROM grid g LEFT JOIN cnt c ON g.n_name = c.n_name AND g.p = c.p
      |), tot AS (
      |  SELECT n_name, sum(o) AS n, count(*) AS k FROM fullg GROUP BY 1
      |)
      |SELECT f.n_name, CAST(t.n AS BIGINT) AS n_orders,
      |  CAST(sum((f.o * t.k - t.n) * (f.o * t.k - t.n)) AS VARCHAR) AS chisq_scaled,
      |  CAST((1000 * sum((f.o * t.k - t.n) * (f.o * t.k - t.n))) // (t.n * t.k) AS BIGINT)
      |    AS chisq_milli,
      |  CAST((1000 * sum((f.o * t.k - t.n) * (f.o * t.k - t.n))) // (t.n * t.k) > 18467
      |    AS BOOLEAN) AS uniform_rejected
      |FROM fullg f JOIN tot t ON f.n_name = t.n_name
      |GROUP BY 1, t.n, t.k ORDER BY 1""".stripMargin
}
