package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Grouped correlation / least-squares regression (SURVEY.md §2b) —
  * `corr()` the way a 100 TB engine must compute it: from EXACT
  * sufficient statistics, not streaming floating moments. Spark's
  * built-in `corr`/`covar_pop` (and DuckDB's) accumulate doubles in
  * partition-merge order, so their low bits are partitioning-dependent
  * — the same nondeterminism the money family eliminated with BIGINT
  * cents. Here every sufficient statistic (n, Σx, Σy, Σxy, Σx², Σy²)
  * is an exact integer (quantities, money as cents) summed as
  * DECIMAL(38,0) — Σy² alone reaches ~6·10²⁰ at sf1, past int64 —
  * and the derived quantities are:
  *
  *   - slope_micro: exact integral `div` of decimal integers — the
  *     regression slope in micro-cents per quantity unit, zero
  *     floating point anywhere;
  *   - corr_r6: the one genuinely irrational step (sqrt) done in
  *     IEEE doubles — sqrt and divide are CORRECTLY-ROUNDED ops, and
  *     their inputs are exact-integer conversions, so both engines
  *     see bit-identical operands; round(6) absorbs the decimal→double
  *     conversion edge.
  *
  * Scale shape: ONE map-side-combined aggregate over the scan (seven
  * integer sums per group), grouped on low-cardinality flags — the
  * shuffle carries |groups|·|partitions| rows. No second pass, no
  * mean-centering pass (the n·Σxy − Σx·Σy form is the one-pass
  * identity), no window.
  */
object Corr {

  def qCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_linestatus"),
        floor(col("l_quantity") + lit(0.5)).cast("long").as("x"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("y"))
    val stats = li.groupBy("l_returnflag", "l_linestatus").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      // cast BEFORE the product: a long y² overflows at ~3e9 cents
      // per row (ANSI throws) — the decimal multiply never does
      sum(col("x").cast(d38) * col("x").cast(d38)).as("sxx"),
      sum(col("y").cast(d38) * col("y").cast(d38)).as("syy"),
      sum(col("x").cast(d38) * col("y").cast(d38)).as("sxy"))
    stats.select(
      col("l_returnflag"), col("l_linestatus"), col("n"),
      col("sx").as("sum_qty"), col("sy").as("sum_price_cents"),
      (col("n").cast(d38) * col("sxy") - col("sx").cast(d38) * col("sy").cast(d38)).as("cov_n"),
      (col("n").cast(d38) * col("sxx") - col("sx").cast(d38) * col("sx").cast(d38)).as("varx_n"),
      (col("n").cast(d38) * col("syy") - col("sy").cast(d38) * col("sy").cast(d38)).as("vary_n"))
    .select(
      col("l_returnflag"), col("l_linestatus"), col("n"),
      col("sum_qty"), col("sum_price_cents"),
      call_function("div", col("cov_n") * lit(1000000L).cast(d38), col("varx_n"))
        .cast("long").as("slope_micro"),
      round(col("cov_n").cast("double") /
        (sqrt(col("varx_n").cast("double")) * sqrt(col("vary_n").cast("double"))), 6)
        .as("corr_r6"))
    .orderBy("l_returnflag", "l_linestatus")
  }

  /** DuckDB oracle: HUGEINT sufficient statistics, same identities. */
  val oracleSql: String =
    """WITH b AS (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
      |  FROM lineitem
      |), s AS (
      |  SELECT l_returnflag, l_linestatus, count(*) AS n,
      |    sum(x) AS sx, sum(y) AS sy,
      |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      |  FROM b GROUP BY 1, 2
      |), d AS (
      |  SELECT l_returnflag, l_linestatus, n, sx, sy,
      |    n * sxy - sx * sy AS cov_n,
      |    n * sxx - sx * sx AS varx_n,
      |    n * syy - sy * sy AS vary_n
      |  FROM s
      |)
      |SELECT l_returnflag, l_linestatus, CAST(n AS BIGINT) AS n,
      |  CAST(sx AS BIGINT) AS sum_qty, CAST(sy AS BIGINT) AS sum_price_cents,
      |  CAST((cov_n * 1000000) // varx_n AS BIGINT) AS slope_micro,
      |  round(CAST(cov_n AS DOUBLE) /
      |    (sqrt(CAST(varx_n AS DOUBLE)) * sqrt(CAST(vary_n AS DOUBLE))), 6) AS corr_r6
      |FROM d ORDER BY l_returnflag, l_linestatus""".stripMargin
}
