package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H Q7-shaped "volume shipping" (SURVEY.md §2b): bilateral trade
  * revenue between two nations by ship year — a SIX-table join whose
  * defining feature is the DISJUNCTIVE cross-nation predicate
  * `(n1=A AND n2=B) OR (n1=B AND n2=A)`: the OR must ride the join as
  * a filter over two already-equi-joined dims, never degrade the plan
  * to a nested loop or cartesian (PlanAuditSpec pins it). Revenue in
  * exact integer units (cents × discount-percent), ONE final IEEE
  * division; the year extraction is cast to INTEGER in the single SQL
  * text so both engines emit the same column type.
  *
  * At 100 TB: nation is a broadcast dim on BOTH sides of the fact,
  * the supplier/customer joins are key-partitioned, and the ≤ (2
  * nations)² × years output group count makes the aggregate a
  * map-side-combined rollup. DuckDB runs the SAME SQL text.
  */
object VolumeShipping {

  def sql(lineitem: String, orders: String, customer: String,
          supplier: String, nation: String): String =
    s"""SELECT supp_nation, cust_nation, l_year,
       |  CAST(sum(volume_u) AS DOUBLE) / 10000 AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
       |    CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
       |      (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)) AS volume_u
       |  FROM $supplier s, $lineitem l, $orders o, $customer c, $nation n1, $nation n2
       |  WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
       |    AND c.c_custkey = o.o_custkey
       |    AND s.s_nationkey = n1.n_nationkey AND c.c_nationkey = n2.n_nationkey
       |    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
       |      OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
       |    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l.l_shipdate < TIMESTAMP '1998-01-01') shipping
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  def qVolumeShipping(spark: SparkSession, sfDir: String): DataFrame =
    SqlViews.withTempViews(spark, Seq(
      "lineitem" -> spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "orders" -> spark.read.parquet(s"$sfDir/orders.parquet"),
      "customer" -> spark.read.parquet(s"$sfDir/customer.parquet"),
      "supplier" -> spark.read.parquet(s"$sfDir/supplier.parquet"),
      "nation" -> spark.read.parquet(s"$sfDir/nation.parquet"))) { v =>
      spark.sql(sql(v("lineitem"), v("orders"), v("customer"),
        v("supplier"), v("nation")))
    }
}
