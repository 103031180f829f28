package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H Q9 shape (SURVEY.md §2b) — "product type profit measure":
  * a LIKE-filtered part dimension joined through the full fact chain
  * (part → lineitem → supplier → orders → nation) into an aggregate
  * keyed on EXPRESSIONS from two different tables (supplier nation ×
  * order year), with the measure itself mixing columns from THREE
  * tables: profit = revenue(lineitem) − cost(part × lineitem
  * quantity). This is the classic "derived-column group-by over a
  * long join chain" shape — the last of the multi-join TPC-H
  * families next to Q7 (20al15) and Q8 (20al16).
  *
  * Corpus adaptation: this corpus has no partsupp, so unit cost is
  * `p_retailprice` (the part dim's money column) instead of
  * ps_supplycost — same three-table measure arithmetic, same join
  * arity minus the partsupp hop; and the LIKE filter rides p_name's
  * color vocabulary (`'%red%'`).
  *
  * Money discipline (repo-wide rule): revenue in 10⁻⁴-dollar units
  * (cents × (100 − discount-cents)), cost aligned to the same scale
  * (cents × 100 × quantity), summed as BIGINT, ONE cast-to-double
  * division at the end — bit-identical across engines.
  *
  * At 100 TB: part (LIKE-filtered, ~1/8 of an already-small dim),
  * supplier and nation broadcast; lineitem shuffles only on its join
  * keys to orders; the aggregate is map-side-combined to
  * |nations|×|years| rows. The spec pins no loop join through the
  * five-table chain and cross-checks the profit against an explicit
  * DataFrame pipeline. DuckDB runs the SAME SQL text.
  */
object ProfitMeasure {

  def sql(lineitem: String, orders: String, part: String,
          supplier: String, nation: String): String =
    s"""SELECT nation, o_year, CAST(sum(amount_u) AS DOUBLE) / 10000 AS sum_profit
       |FROM (
       |  SELECT n.n_name AS nation,
       |    CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
       |    CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
       |      (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)) -
       |    CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT) * 100 *
       |      CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS amount_u
       |  FROM $part p, $supplier s, $lineitem l, $orders o, $nation n
       |  WHERE s.s_suppkey = l.l_suppkey AND p.p_partkey = l.l_partkey
       |    AND o.o_orderkey = l.l_orderkey AND s.s_nationkey = n.n_nationkey
       |    AND p.p_name LIKE '%red%'
       |) profit
       |GROUP BY nation, o_year
       |ORDER BY nation, o_year DESC""".stripMargin

  def qProfitMeasure(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "lineitem" -> spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "orders" -> spark.read.parquet(s"$sfDir/orders.parquet"),
      "part" -> spark.read.parquet(s"$sfDir/part.parquet"),
      "supplier" -> spark.read.parquet(s"$sfDir/supplier.parquet"),
      "nation" -> spark.read.parquet(s"$sfDir/nation.parquet"))) { v =>
      spark.sql(sql(v("lineitem"), v("orders"), v("part"),
        v("supplier"), v("nation")))
    }
}
