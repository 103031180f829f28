package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-pass table profiling (SURVEY.md §2b) — the ANALYZE/SUMMARIZE
  * report an ingest pipeline runs before trusting a drop: per-column
  * row count, null count, exact distinct count, and min/max, for a
  * mixed-type column set, in ONE scan of the table. The per-column
  * reports are conditional aggregates over the same pass; the N exact
  * distincts ride Catalyst's Expand rewrite (each row replicated once
  * per profiled column with a grouping tag — the q_multi_distinct
  * machinery), so the table is read exactly once no matter how many
  * columns are profiled (spec-pinned: one FileScan, Expand present,
  * no Join/Union of per-column subplans).
  *
  * Every metric is an exact BIGINT: quantities are integral, money is
  * exact cents (`floor(p·100+½)`), the flag column profiles as its
  * ASCII code, timestamps as epoch microseconds — so the whole report
  * hash-matches DuckDB with no float anywhere. NULLs are PLANTED by id
  * residue (quantity at orderkey%97=13, returnflag at %89=7, replanted
  * in the oracle) so the null accounting has a known non-zero answer.
  *
  * At 100 TB: one scan + a 4-way Expand is the floor for exact
  * distincts; when approximate is acceptable, swap count_distinct for
  * HLL states (q_approx_distinct / q_hll_sketch) and the Expand
  * disappears — that trade is the documented scale knob.
  */
object Profile {

  def qProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val d = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        when(col("l_orderkey") % 97 === 13, lit(null))
          .otherwise(col("l_quantity").cast("long")).as("qty"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"),
        when(col("l_orderkey") % 89 === 7, lit(null))
          .otherwise(ascii(col("l_returnflag")).cast("long")).as("flag"),
        // NTZ → session-UTC timestamp → µs (the normalizeTs rule)
        unix_micros(col("l_shipdate").cast("timestamp")).as("sd"))

    val wide = d.agg(
      count(lit(1)).as("n_rows"),
      count(col("qty")).as("qty_n"), countDistinct(col("qty")).as("qty_d"),
      min("qty").as("qty_min"), max("qty").as("qty_max"),
      count(col("cents")).as("cents_n"), countDistinct(col("cents")).as("cents_d"),
      min("cents").as("cents_min"), max("cents").as("cents_max"),
      count(col("flag")).as("flag_n"), countDistinct(col("flag")).as("flag_d"),
      min("flag").as("flag_min"), max("flag").as("flag_max"),
      count(col("sd")).as("sd_n"), countDistinct(col("sd")).as("sd_d"),
      min("sd").as("sd_min"), max("sd").as("sd_max"))

    def report(name: String, p: String) = struct(
      lit(name).as("col_name"),
      col("n_rows"),
      (col("n_rows") - col(s"${p}_n")).as("n_null"),
      col(s"${p}_d").as("n_distinct"),
      col(s"${p}_min").as("min_v"),
      col(s"${p}_max").as("max_v"))

    wide.select(explode(array(
        report("l_extendedprice", "cents"),
        report("l_quantity", "qty"),
        report("l_returnflag", "flag"),
        report("l_shipdate", "sd"))).as("r"))
      .select("r.*")
      .orderBy("col_name")
  }

  val oracleSql: String =
    """WITH d AS (
      |  SELECT
      |    CASE WHEN l_orderkey % 97 = 13 THEN NULL
      |         ELSE CAST(l_quantity AS BIGINT) END AS qty,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
      |    CASE WHEN l_orderkey % 89 = 7 THEN NULL
      |         ELSE CAST(ascii(l_returnflag) AS BIGINT) END AS flag,
      |    epoch_us(l_shipdate) AS sd
      |  FROM lineitem
      |)
      |SELECT 'l_extendedprice' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(*) - count(cents) AS BIGINT) AS n_null,
      |  CAST(count(DISTINCT cents) AS BIGINT) AS n_distinct,
      |  min(cents) AS min_v, max(cents) AS max_v FROM d
      |UNION ALL
      |SELECT 'l_quantity', CAST(count(*) AS BIGINT),
      |  CAST(count(*) - count(qty) AS BIGINT),
      |  CAST(count(DISTINCT qty) AS BIGINT), min(qty), max(qty) FROM d
      |UNION ALL
      |SELECT 'l_returnflag', CAST(count(*) AS BIGINT),
      |  CAST(count(*) - count(flag) AS BIGINT),
      |  CAST(count(DISTINCT flag) AS BIGINT), min(flag), max(flag) FROM d
      |UNION ALL
      |SELECT 'l_shipdate', CAST(count(*) AS BIGINT),
      |  CAST(count(*) - count(sd) AS BIGINT),
      |  CAST(count(DISTINCT sd) AS BIGINT), min(sd), max(sd) FROM d
      |ORDER BY col_name""".stripMargin
}
