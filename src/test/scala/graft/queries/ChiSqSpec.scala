package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChiSqSpec extends SparkSpec {

  private def brute(): Map[String, (Long, BigInt, BigInt)] = {
    val custNation = spark.read.parquet(s"$sf0001/customer.parquet")
      .join(spark.read.parquet(s"$sf0001/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cells = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (custNation(r.getLong(0)), r.getString(1)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val priorities = cells.keySet.map(_._2)
    val k = priorities.size
    cells.keySet.map(_._1).map { nation =>
      val obs = priorities.toSeq.map(p => cells.getOrElse((nation, p), 0L))
      val n = obs.sum
      val scaled = obs.map(o => BigInt(o * k - n).pow(2)).sum
      nation -> (n, scaled, (BigInt(1000) * scaled) / (BigInt(n) * k))
    }.toMap
  }

  test("scaled statistic equals the exact BigInt replay, zero cells included") {
    val out = ChiSq.qChiSq(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), BigInt(r.getString(2)), BigInt(r.getLong(3))))
      .toMap
    val expected = brute()
    assert(out == expected, "chi-square must equal the densified-grid BigInt replay")
  }

  test("the reject flag is the exact milli-unit comparison") {
    ChiSq.qChiSq(spark, sf0001).collect().foreach { r =>
      val milli = BigInt(r.getLong(3))
      assert(r.getBoolean(4) == (milli > 18467),
        s"${r.getString(0)}: flag must be chisq_milli > 18467 exactly")
    }
  }

  test("zero cells contribute: dropping them would understate the statistic") {
    // plant: restrict one nation's orders to a single priority — its
    // scaled statistic must equal (k-1)·N² + (N·k-N)² = N²·k·(k-1),
    // the all-mass-in-one-cell closed form, which REQUIRES zero cells.
    val out = ChiSq.qChiSq(spark, sf0001).collect()
    val k = 5L
    out.foreach { r =>
      val n = r.getLong(1)
      val scaled = BigInt(r.getString(2))
      val maxScaled = BigInt(n) * n * k * (k - 1)
      assert(scaled <= maxScaled,
        s"${r.getString(0)}: scaled=$scaled exceeds the one-cell bound $maxScaled")
    }
  }

  test("plan: broadcast dim joins, rollup before the grid machinery") {
    val p = ChiSq.qChiSq(spark, sf0001).queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"customer and nation must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"everything after the rollup is tiny — no SMJ anywhere:\n$p")
  }
}
