package graft.queries

import graft.SparkSpec

class LateralSpec extends SparkSpec {

  test("lateral top-2 equals the window-function equivalent") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val expected = spark.read.parquet(s"$sf001/customer.parquet")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .join(spark.read.parquet(s"$sf001/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_custkey", "c_acctbal")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Lateral.qLateralTopK(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSet == expected)
    assert(got.length == expected.size, "ordered output carries no duplicates")
  }

  test("the lateral subquery is decorrelated: one WindowGroupLimit scan, no per-row re-execution") {
    val plan = Lateral.qLateralTopK(spark, sf001).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), "top-k must pre-cut via WindowGroupLimit")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "decorrelation must produce an equi-join, not a nested loop")
  }
}
