package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan + semantics pins for the Q7/Q8/Q11 trade shapes (round 12) —
  * same discipline as DecorrelationMatrixSpec: one SQL text runs in
  * both engines; these specs pin the PLAN properties a 100 TB run
  * depends on plus an in-engine semantic cross-check.
  */
class TradeShapesSpec extends SparkSpec {

  private def assertNoLoopJoin(df: org.apache.spark.sql.DataFrame): Unit = {
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.contains("CartesianProduct") &&
      !planStr.contains("BroadcastNestedLoopJoin"),
      s"equi joins only:\n$planStr")
  }

  test("Q7 shape (q_volume_shipping): the disjunctive cross-nation " +
    "predicate rides equi joins (no nested loop), and the bilateral " +
    "revenue equals the explicit two-filter union") {
    val df = VolumeShipping.qVolumeShipping(spark, sf001)
    assertNoLoopJoin(df)
    val got = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(2)) -> r.getDouble(3)).toMap
    assert(got.nonEmpty && got.keys.map(_._1).toSet ==
      Set("NATION_3", "NATION_8"), s"both directions must appear: ${got.keys}")

    val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val customer = spark.read.parquet(s"$sf001/customer.parquet")
    val supplier = spark.read.parquet(s"$sf001/supplier.parquet")
    val nation = spark.read.parquet(s"$sf001/nation.parquet")
    def nationOf(col1: String) = nation.select(
      col("n_nationkey").as(s"${col1}_key"), col("n_name").as(col1))
    val base = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(nationOf("supp_nation"), col("s_nationkey") === col("supp_nation_key"))
      .join(nationOf("cust_nation"), col("c_nationkey") === col("cust_nation_key"))
      .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8") ||
        (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg((sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
        (lit(100) - floor(col("l_discount") * 100 + 0.5).cast("long")))
        .cast("double") / 10000).as("revenue"))
    val expect = base.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(2)) -> r.getDouble(3)).toMap
    assert(got == expect, s"Q7 drifted: $got vs $expect")
  }

  test("Q8 shape (q_market_share): no nested loop, shares lie in [0,1], " +
    "and the focal nation's share equals the explicit conditional ratio") {
    val df = MarketShare.qMarketShare(spark, sf001)
    assertNoLoopJoin(df)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getDouble(1)
      assert(s >= 0.0 && s <= 1.0, s"share out of range: $r")
    }
    // at least one year must have a strictly interior share (the CASE
    // actually discriminates — an always-0/always-1 column would mean
    // the nation filter or the CASE key is wrong)
    assert(rows.exists(r => r.getDouble(1) > 0.0 && r.getDouble(1) < 1.0),
      s"degenerate shares: ${rows.mkString(", ")}")
  }

  test("Q19 shape (q_disjunctive_join): the common equi conjunct factors " +
    "out of the disjunction — a HASH join with the branch ranges as a " +
    "residual filter, never a loop join over |lineitem|x|part|") {
    val df = DisjunctiveJoin.qDisjunctiveJoin(spark, sf001)
    val planStr = df.queryExecution.executedPlan.toString
    assert(!planStr.contains("CartesianProduct") &&
      !planStr.contains("BroadcastNestedLoopJoin"),
      s"the disjunction must not degrade the join:\n$planStr")
    assert(planStr.contains("HashJoin"),
      s"expected a hash join on the factored p_partkey = l_partkey:\n$planStr")
    val r = df.head()
    assert(r.getLong(1) > 0, "the three branches must select rows")

    // semantic cross-check: union of the three explicit branch filters
    val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
    val part = spark.read.parquet(s"$sf001/part.parquet")
    val joined = lineitem.join(part, col("l_partkey") === col("p_partkey"))
    def branch(brand: String, sizeHi: Int, qLo: Int, qHi: Int) =
      joined.filter(col("p_brand") === brand &&
        col("p_size").between(1, sizeHi) && col("l_quantity").between(qLo, qHi))
    val expect = branch("Brand#1", 15, 1, 20)
      .unionByName(branch("Brand#2", 25, 10, 30))
      .unionByName(branch("Brand#3", 35, 20, 40))
      .agg(count(lit(1))).head().getLong(0)
    assert(r.getLong(1) == expect,
      s"Q19 item count drifted: ${r.getLong(1)} vs $expect")
  }

  test("Q12 shape (q_ship_priority): high + low counts partition each " +
    "class exactly") {
    val df = ShipPriority.qShipPriority(spark, sf001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val total = lineitem.count()
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum == total,
      "every line item lands in exactly one of high/low")
    assert(rows.exists(_.getLong(2) > 0) && rows.exists(_.getLong(3) > 0),
      "both CASE arms must discriminate")
  }

  test("Q11 shape (q_important_stock): exactly TWO uncorrelated scalar " +
    "subqueries (count and total, each executed once), no nested loop, " +
    "and rows equal the explicit above-2x-average pipeline") {
    val df = ImportantStock.qImportantStock(spark, sf001)
    val subs = df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.ScalarSubquery => s
      })
    }.flatten
    assert(subs.size == 2 && subs.forall(_.outerAttrs.isEmpty),
      s"two uncorrelated scalars expected, got ${subs.size}")
    assertNoLoopJoin(df)

    val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
    val supplier = spark.read.parquet(s"$sf001/supplier.parquet")
    val nation = spark.read.parquet(s"$sf001/nation.parquet")
    val stock = lineitem
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(nation.filter(col("n_name").isin("NATION_3", "NATION_8")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
        col("l_quantity").cast("long")).as("value_u"))
    val (cnt, total) = {
      val r = stock.agg(count(lit(1)), sum("value_u")).head()
      (r.getLong(0), r.getLong(1))
    }
    val expect = stock.filter(col("value_u") * cnt > lit(2L) * total)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r =>
      r.getLong(0) -> math.round(r.getDouble(1) * 100)).toMap
    assert(got == expect && got.nonEmpty,
      s"Q11 drifted (${got.size} vs ${expect.size})")
  }
}
