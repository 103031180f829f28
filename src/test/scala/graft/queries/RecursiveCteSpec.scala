package graft.queries

import graft.SparkSpec

class RecursiveCteSpec extends SparkSpec {

  test("native WITH RECURSIVE equals the pointer-jumped operator row-for-row") {
    val native = RecursiveCte.qRecursiveCte(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val jumped = Hierarchy.qHierarchy(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(native.length == 15000)
    assert(native.sameElements(jumped),
      "two closure implementations (UnionLoop vs pointer jumping) must agree")
  }

  test("plan: UnionLoop recursion with a pruned, filter-pushed edge scan") {
    val df = RecursiveCte.resolved(spark,
      spark.read.parquet(s"$sf0001/orders.parquet"))
    val plan = df.queryExecution.executedPlan.toString
    // native recursion, not an expanded union or an error
    assert(plan.contains("UnionLoop"), s"expected UnionLoop in:\n$plan")
    assert(plan.contains("UnionLoopRef"), "recursive self-reference must be present")
    // the per-level edge re-scan must read ONLY the join key: column
    // pruning reached inside the loop (a full-width per-level scan is
    // the difference between d·|key column| and d·|table| at 100 TB)
    assert("""Project \[o_orderkey#\d+L\]""".r.findFirstIn(plan).isDefined,
      s"recursive edge scan must be pruned to o_orderkey only:\n$plan")
    // and the anchor filter is pushed to the scan
    assert(plan.contains("o_orderkey#") && plan.contains("< 10"),
      "anchor predicate must reach the scan")
  }
}
