package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MarketBasketSpec extends SparkSpec {

  test("pair support is bounded by each brand's reach, pairs canonical, top-20 ordered") {
    val rows = MarketBasket.qMarketBasket(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 20)
    rows.foreach { case (b1, b2, both, n1, n2) =>
      assert(b1 < b2, "pairs must be canonicalized b1 < b2")
      assert(both <= math.min(n1, n2),
        s"co-occurrence $both cannot exceed either brand's own reach ($n1, $n2)")
      assert(both >= 1)
    }
    assert(rows.map(_._3).toSeq == rows.map(_._3).sortBy(-_).toSeq,
      "rows must arrive in descending support order")
  }

  test("support equals the brute per-order intersection count for the top pair") {
    val top = MarketBasket.qMarketBasket(spark, sf0001).head()
    val (b1, b2) = (top.getString(0), top.getString(1))
    val ob = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .join(spark.read.parquet(s"$sf0001/part.parquet"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("brand")).distinct()
    val brute = ob.filter(col("brand") === b1).select("ok")
      .intersect(ob.filter(col("brand") === b2).select("ok")).count()
    assert(top.getLong(2) == brute, s"($b1,$b2): engine ${top.getLong(2)} vs brute $brute")
  }

  test("plan: pairing is an equi-join, never a nested loop or cartesian product") {
    val plan = MarketBasket.qMarketBasket(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"the basket self-join must stay an equi-join:\n$plan")
  }
}
