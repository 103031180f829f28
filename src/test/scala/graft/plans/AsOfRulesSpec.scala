package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The as-of join's optimizer integration: left-only predicates travel
  * below the custom operator all the way into the parquet scan; right
  * and mixed predicates stay above it (they are not semantics-preserving
  * under null-extension / candidate selection).
  */
class AsOfRulesSpec extends SparkSpec {

  private def asofOnTables() = {
    val events = graft.queries.Analytics.loadEvents(spark, sf0001)
      .select(col("event_id"), pmod(col("user_id"), lit(50)).as("k"),
        unix_micros(col("ts")).as("t"))
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(pmod(col("o_custkey"), lit(50)).as("k2"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t2"))
      .agg(max("o_orderkey").as("okey"))
    AsOf.join(events, orders, Seq(events("k")), Seq(orders("k2")), events("t"), orders("t2"))
  }

  test("left-only predicates push through the as-of join into the scan") {
    val filtered = asofOnTables().filter(col("event_id") < 100)
    val plan = filtered.queryExecution.executedPlan.toString
    // the predicate must reach the events parquet scan as a pushed filter
    assert(plan.replaceAll("\\s+", " ")
      .matches("(?s).*PushedFilters: \\[[^\\]]*LessThan\\(event_id,100\\).*"),
      s"left predicate should be pushed into the events scan:\n$plan")
    // and the results match filtering after the join
    val after = asofOnTables().collect().filter(r => r.getLong(0) < 100)
    assert(filtered.count() == after.length)
  }

  test("right-side predicates are NOT pushed (null-extension + candidate choice)") {
    val filtered = asofOnTables().filter(col("okey") > 0)
    val opt = filtered.queryExecution.optimizedPlan
    // the Filter must remain above the AsOfJoin node
    val filterAboveAsof = opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[AsOfJoin] => f
    }
    assert(filterAboveAsof.nonEmpty,
      s"right-side predicate must stay above the as-of join:\n$opt")
    // semantics: it drops the null-extended (unmatched) rows only
    val all = asofOnTables().collect()
    val okeyIdx = asofOnTables().schema.fieldIndex("okey")
    assert(filtered.count() == all.count(r => !r.isNullAt(okeyIdx) && r.getLong(okeyIdx) > 0))
  }

  test("mixed conjunctions split: left part pushes, rest stays") {
    val filtered = asofOnTables()
      .filter(col("event_id") < 500 && col("okey") > 0)
    val opt = filtered.queryExecution.optimizedPlan
    val keptFilters = opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[AsOfJoin] => f.condition.toString
    }
    assert(keptFilters.nonEmpty && keptFilters.head.contains("okey"))
    assert(!keptFilters.head.contains("event_id"),
      s"left conjunct should have been pushed below: ${keptFilters.head}")
  }
}
