package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H Q8-shaped "national market share" (SURVEY.md §2b): the widest
  * join in the classic suite — EIGHT tables (part, supplier, lineitem,
  * orders, customer, nation ×2, region) — feeding a CONDITIONAL
  * aggregate ratio: share = Σ(volume where supplier-nation = X) /
  * Σ(volume) per order year, the CASE-inside-SUM pattern every BI
  * workload runs. Both sums are exact integer units cast to double
  * once, so the ratio is bit-identical across engines.
  *
  * At 100 TB: part/nation/region broadcast, the customer-side region
  * filter prunes the probe BEFORE the wide join chain, and the output
  * is |years| rows from a map-side-combined aggregate — the whole
  * 8-table plan shuffles the fact at most on its join keys, never for
  * the ratio. DuckDB runs the SAME SQL text (its own join order — the
  * ratio rows are the contract).
  */
object MarketShare {

  def sql(lineitem: String, orders: String, customer: String,
          supplier: String, part: String, nation: String,
          region: String): String =
    s"""SELECT o_year,
       |  CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume_u ELSE 0 END) AS DOUBLE)
       |    / CAST(sum(volume_u) AS DOUBLE) AS mkt_share
       |FROM (
       |  SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
       |    CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
       |      (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)) AS volume_u,
       |    n2.n_name AS nation
       |  FROM $part p, $supplier s, $lineitem l, $orders o, $customer c,
       |       $nation n1, $nation n2, $region r
       |  WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
       |    AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
       |    AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = r.r_regionkey
       |    AND r.r_name = 'ASIA' AND s.s_nationkey = n2.n_nationkey
       |    AND p.p_type = 'PROMO') all_nations
       |GROUP BY o_year
       |ORDER BY o_year""".stripMargin

  def qMarketShare(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "lineitem" -> spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "orders" -> spark.read.parquet(s"$sfDir/orders.parquet"),
      "customer" -> spark.read.parquet(s"$sfDir/customer.parquet"),
      "supplier" -> spark.read.parquet(s"$sfDir/supplier.parquet"),
      "part" -> spark.read.parquet(s"$sfDir/part.parquet"),
      "nation" -> spark.read.parquet(s"$sfDir/nation.parquet"),
      "region" -> spark.read.parquet(s"$sfDir/region.parquet"))) { v =>
      spark.sql(sql(v("lineitem"), v("orders"), v("customer"),
        v("supplier"), v("part"), v("nation"), v("region")))
    }
}
