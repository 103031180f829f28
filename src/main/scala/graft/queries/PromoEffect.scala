package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H Q14 shape (SURVEY.md §2b) — "promotion effect": the
  * two-conditional-aggregates-ONE-scan ratio — promo revenue share =
  * 100 × Σ(volume where p_type = PROMO) / Σ(volume) over one
  * date-windowed lineitem ⋈ part join. Adjacent to Q8 (20al16) but
  * the single-row global form: no grouping key at all, so the whole
  * plan must collapse to ONE scan of the fact feeding ONE
  * partial/final aggregate pair — the classic mistake is writing the
  * numerator and denominator as two separate queries (two scans, two
  * shuffles; at 100 TB, twice the IO for one number). The spec pins
  * exactly one lineitem scan in the physical plan.
  *
  * Money discipline: both sums are exact 10⁻⁴-dollar BIGINTs; the
  * percentage multiplies the numerator by 100 while still integer,
  * then ONE cast-to-double division — bit-identical across engines.
  * The date window prunes lineitem at the scan; part broadcasts;
  * p_type rides inside the CASE, not the WHERE (every joined row
  * lands in the denominator). DuckDB runs the SAME SQL text.
  */
object PromoEffect {

  def sql(lineitem: String, part: String): String =
    s"""SELECT CAST(100 * sum(CASE WHEN p.p_type = 'PROMO' THEN volume_u ELSE 0 END)
       |         AS DOUBLE) / CAST(sum(volume_u) AS DOUBLE) AS promo_revenue_pct
       |FROM (
       |  SELECT l_partkey,
       |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) *
       |      (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS volume_u
       |  FROM $lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-07-01'
       |    AND l_shipdate < TIMESTAMP '1997-10-01'
       |) l JOIN $part p ON l.l_partkey = p.p_partkey""".stripMargin

  def qPromoEffect(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "lineitem" -> spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "part" -> spark.read.parquet(s"$sfDir/part.parquet"))) { v =>
      spark.sql(sql(v("lineitem"), v("part")))
    }
}
