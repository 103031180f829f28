package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CohortSpec extends SparkSpec {

  test("cohort matrix conserves revenue and anchors every cohort at months_since 0") {
    val rows = Cohort.qCohort(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, ms, n, rev) =>
      assert(ms >= 0, "an order cannot precede its customer's first order")
      assert(n > 0 && rev > 0)
    }
    // every cohort has its acquisition cell, and that cell holds the
    // whole cohort (every member ordered in their own first month)
    val cohorts = rows.map(_._1).distinct
    val anchor = rows.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    assert(cohorts.forall(anchor.contains), "every cohort must have a months_since=0 cell")
    val firstMonths = spark.read.parquet(s"$sf001/orders.parquet")
      .groupBy("o_custkey").agg(min("o_orderdate").as("fd"))
      .groupBy((year(col("fd")) * 12 + month(col("fd"))).cast("int").as("cohort_m"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(anchor == firstMonths, "the anchor cell must hold the full cohort")

    // revenue conservation: the matrix total equals the orders total
    // (exact cents both sides — no tolerance needed)
    val matrixCents = rows.map(r => math.round(r._4 * 100)).sum
    val totalCents = spark.read.parquet(s"$sf001/orders.parquet")
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5))).head().getLong(0)
    assert(matrixCents == totalCents, s"matrix $matrixCents != orders $totalCents")
  }
}
