package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExistsSubquerySpec extends SparkSpec {

  test("EXISTS/NOT EXISTS SQL equals the explicit semi/anti join pipeline") {
    val customer = spark.read.parquet(s"$sf001/customer.parquet")
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val big = orders.filter(col("o_totalprice") > 300000)
    val f = orders.filter(col("o_orderstatus") === "F")
    val expected = customer
      .join(big, customer("c_custkey") === big("o_custkey"), "left_semi")
      .join(f, customer("c_custkey") === f("o_custkey"), "left_anti")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_picky"))
      .collect().map(r => r.getAs[Number](0).longValue() -> r.getLong(1)).toMap
    val got = ExistsSubquery.qExistsSubquery(spark, sf001).collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.values.sum > 0, "the predicate pair must keep some customers")
  }

  test("both predicates decorrelate: semi + anti hash joins, no nested loop, no Subquery") {
    val plan = ExistsSubquery.qExistsSubquery(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS must become a left-semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS must become a left-anti join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "decorrelation must produce equi-joins, not a nested loop")
  }
}
