package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GlobalScalarSpec extends SparkSpec {

  test("Q22 shape equals the explicit three-stage pipeline") {
    val customer = spark.read.parquet(s"$sf001/customer.parquet")
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val codes = Set("06", "09", "12", "31", "55", "56", "68")
    val cohort = customer
      .withColumn("cntrycode", expr("right(c_name, 2)"))
      .filter(col("cntrycode").isin(codes.toSeq: _*))
      .withColumn("bal_cents", floor(col("c_acctbal") * 100 + 0.5).cast("long"))
    val avgBal = cohort.filter(col("c_acctbal") > 0.0)
      .agg(avg("bal_cents")).head().getDouble(0)
    val big = orders.filter(col("o_totalprice") > 400000)
    val expected = cohort
      .filter(col("bal_cents") > avgBal)
      .join(big, cohort("c_custkey") === big("o_custkey"), "left_anti")
      .groupBy("cntrycode")
      .agg(count(lit(1)).as("numcust"),
        (sum("bal_cents").cast("double") / 100).as("totacctbal"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val got = GlobalScalar.qGlobalScalar(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty && got.exists(_._2 > 0), "the cohort must be non-empty")
  }

  test("the scalar subquery executes ONCE (one SubqueryExec), NOT EXISTS " +
    "is a left-anti hash join, and no nested loop appears") {
    val df = GlobalScalar.qGlobalScalar(spark, sf001)
    val plan = df.queryExecution.executedPlan
    val planStr = plan.toString
    assert(planStr.contains("LeftAnti"),
      s"NOT EXISTS must become a left-anti join:\n$planStr")
    assert(!planStr.contains("CartesianProduct") &&
      !planStr.contains("BroadcastNestedLoopJoin"),
      "the uncorrelated scalar must be a literal broadcast, not a join explosion")
    // exactly ONE scalar-subquery EXPRESSION with one exprId in the
    // optimized plan (the physical tree hides its children under the
    // AQE root): the global avg is evaluated once and injected as a
    // literal — a per-row re-execution or a correlated rewrite would
    // show more, or a correlated subquery class instead
    val scalarSubs = df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.ScalarSubquery => s
      })
    }.flatten
    assert(scalarSubs.size == 1 && scalarSubs.head.outerAttrs.isEmpty,
      s"global avg must be ONE uncorrelated scalar subquery, got " +
        s"${scalarSubs.size}:\n$planStr")
  }
}
