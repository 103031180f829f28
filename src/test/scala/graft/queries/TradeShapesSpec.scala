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

  test("Q9 shape (q_profit_measure): no loop join through the five-table " +
    "chain, the p_name LIKE filter reaches the part scan, and profit " +
    "equals the explicit DataFrame pipeline") {
    val df = ProfitMeasure.qProfitMeasure(spark, sf001)
    assertNoLoopJoin(df)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("StringContains(p_name,red)"),
      s"the LIKE filter must be pushed to the part scan:\n$planStr")
    val got = df.collect().map(r =>
      (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.nonEmpty)

    val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val part = spark.read.parquet(s"$sf001/part.parquet")
    val supplier = spark.read.parquet(s"$sf001/supplier.parquet")
    val nation = spark.read.parquet(s"$sf001/nation.parquet")
    val expect = lineitem
      .join(part.filter(col("p_name").contains("red")),
        col("l_partkey") === col("p_partkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg((sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
        (lit(100) - floor(col("l_discount") * 100 + 0.5).cast("long")) -
        floor(col("p_retailprice") * 100 + 0.5).cast("long") * 100 *
          floor(col("l_quantity") + 0.5).cast("long"))
        .cast("double") / 10000).as("sum_profit"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got == expect, s"Q9 drifted: ${got.size} vs ${expect.size} groups")
  }

  test("Q10 shape (q_returned_item): the LIMIT-over-aggregate is a " +
    "TakeOrderedAndProject (per-partition top-k), never a global Sort, " +
    "and the cut matches the explicit pipeline") {
    val df = ReturnedItem.qReturnedItem(spark, sf001)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("TakeOrderedAndProject(limit=20"),
      s"top-k must be TakeOrdered, not Sort+Limit:\n$planStr")
    assert(!planStr.contains("Exchange rangepartitioning"),
      s"a range-partitioned global sort defeats the top-k:\n$planStr")
    assert(planStr.contains("EqualTo(l_returnflag,R)"),
      s"the returnflag filter must reach the lineitem scan:\n$planStr")
    val rows = df.collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    // the cut is sorted by revenue DESC then custkey — a total order
    val keys = rows.map(r => (-r.getDouble(2), r.getLong(0))).toSeq
    assert(keys == keys.sorted, "result must honor the ORDER BY")
  }

  test("Q14 shape (q_promo_effect): ONE lineitem scan feeds both " +
    "conditional aggregates (never the two-query spelling), and the " +
    "percentage equals the explicit two-filter ratio") {
    val df = PromoEffect.qPromoEffect(spark, sf001)
    // pre-AQE physical plan: adaptive toString repeats the tree
    val planStr = df.queryExecution.sparkPlan.toString
    val scans = "lineitem\\.parquet".r.findAllIn(planStr).size
    assert(scans == 1, s"expected exactly one lineitem scan, got $scans:\n$planStr")
    val pct = df.head().getDouble(0)
    assert(pct > 0.0 && pct < 100.0, s"degenerate promo share: $pct")

    val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1997-07-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
    val part = spark.read.parquet(s"$sf001/part.parquet")
    val joined = lineitem.join(part, col("l_partkey") === col("p_partkey"))
      .withColumn("volume_u",
        floor(col("l_extendedprice") * 100 + 0.5).cast("long") *
          (lit(100) - floor(col("l_discount") * 100 + 0.5).cast("long")))
    val r = joined.agg(
      sum(when(col("p_type") === "PROMO", col("volume_u")).otherwise(0L)),
      sum(col("volume_u"))).head()
    val expect = 100.0 * r.getLong(0) / r.getLong(1).toDouble
    assert(pct == expect, s"Q14 drifted: $pct vs $expect")
  }

  test("Q16 shape (q_parts_supplier): NOT IN plans as a null-aware " +
    "broadcast anti join, the distinct count uses the two-phase " +
    "expansion, and counts partition the supplier relation") {
    val df = PartsSupplier.qPartsSupplier(spark, sf001)
    // pre-AQE plan: at tiny SF, AQE may elide the anti join entirely
    // once it observes an empty build side — the PLANNED shape is the
    // 100 TB contract being pinned
    val planStr = df.queryExecution.sparkPlan.toString
    assert(planStr.contains("LeftAnti"),
      s"NOT IN must decorrelate to an anti join:\n$planStr")
    assert(planStr.contains("partial_count(distinct"),
      s"distinct count must be the two-phase expansion:\n$planStr")
    assertNoLoopJoin(df)

    // semantic cross-check: per bucket, included + excluded suppliers
    // = all suppliers of the bucket (the NOT IN partitions the set)
    val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
    val part = spark.read.parquet(s"$sf001/part.parquet")
      .filter(col("p_brand") =!= "Brand#13" &&
        !col("p_type").startsWith("MEDIUM") &&
        col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    val supplier = spark.read.parquet(s"$sf001/supplier.parquet")
    val bad = supplier.filter(col("s_acctbal") < 2500)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val buckets = lineitem.join(part, col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("p_type"), col("p_size"), col("l_suppkey"))
      .distinct().collect()
      .groupBy(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .map { case (k, rs) =>
        k -> rs.map(_.getLong(3)).count(s => !bad.contains(s)).toLong
      }
    val got = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    // buckets whose every supplier is excluded vanish (the NOT IN
    // filters BEFORE the group-by) — they must not appear as zeros
    assert(got == buckets.filter(_._2 > 0),
      s"Q16 drifted: ${got.size} vs ${buckets.count(_._2 > 0)} buckets")
    assert(got.nonEmpty && got.values.forall(_ > 0))
  }
}
