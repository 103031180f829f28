package graft.queries

import graft.SparkSpec

class ScalarSubquerySpec extends SparkSpec {

  test("correlated scalar-agg threshold equals the hand-decorrelated aggregate+join") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val part = spark.read.parquet(s"$sf001/part.parquet")
      .filter(col("p_brand") === "Brand#23")
    // the plan Catalyst should arrive at, written by hand: one per-part
    // aggregate over lineitem, joined back, threshold as a plain filter
    val thresholds = li.groupBy(col("l_partkey").as("tk"))
      .agg((avg("l_quantity") * 0.2).as("thr"))
    val expected = li
      .join(part, col("p_partkey") === col("l_partkey"))
      .join(thresholds, col("tk") === col("l_partkey"))
      .filter(col("l_quantity") < col("thr"))
      .agg(count(lit(1)).as("n_small"),
        (sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")) / 100.0).as("total_price"))
      .collect()(0)
    val got = ScalarSubquery.qScalarSubquery(spark, sf001).collect()(0)
    assert(got.getLong(0) == expected.getLong(0))
    assert(got.getLong(0) > 0, "filter must keep some rows or the contract is vacuous")
    assert(got.getDouble(1) == expected.getDouble(1), "exact cents — bit-equal")
  }

  test("the scalar subquery is decorrelated: aggregate+join, no per-outer-row re-execution") {
    val qe = ScalarSubquery.qScalarSubquery(spark, sf001).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "decorrelation must produce equi-joins, not a nested loop")
    // the correlated subquery must be GONE from the physical plan — a
    // per-row scalar subquery would survive as a Subquery/ScalarSubquery
    // node re-executed per outer row
    assert(!plan.contains("ScalarSubquery"),
      "threshold must decorrelate into the join, not re-execute per row")
    // the per-part average appears as ONE aggregate with a map-side
    // partial (two HashAggregates per logical agg: partial + final)
    assert(plan.contains("HashAggregate"), "threshold computed as one aggregate pass")
  }
}
