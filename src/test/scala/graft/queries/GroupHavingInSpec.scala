package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GroupHavingInSpec extends SparkSpec {

  test("rows equal a DataFrame-composed equivalent of the Q18 shape") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"), floor(col("l_quantity") + lit(0.5)).cast("long").as("q"))
    val big = li.groupBy("l_orderkey").agg(sum("q").as("tq"))
      .filter(col("tq") > 200).select("l_orderkey")
    val expect = spark.read.parquet(s"$sf0001/orders.parquet")
      .join(big, col("o_orderkey") === big("l_orderkey"))
      .join(spark.read.parquet(s"$sf0001/customer.parquet"),
        col("c_custkey") === col("o_custkey"))
      .join(li.withColumnRenamed("l_orderkey", "lk"), col("lk") === col("o_orderkey"))
      .groupBy("c_custkey", "o_orderkey").agg(sum("q").as("total_qty"))
      .orderBy(desc("total_qty"), col("o_orderkey")).limit(100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = GroupHavingIn.qGroupHavingIn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, "SQL-text route must equal the composed DataFrame route")
    assert(got.nonEmpty && got.forall(_._3 > 200),
      "every surviving order crosses the HAVING threshold by construction")
  }

  test("plan: the HAVING subquery becomes an aggregate-fed left semi join") {
    val plan = GroupHavingIn.qGroupHavingIn(spark, sf0001)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"IN must decorrelate to a semi join:\n$plan")
    // the semi join's build side is the grouped lineitem, not a raw
    // rescan: an Aggregate must sit under the semi join
    val semiIdx = plan.indexOf("LeftSemi")
    assert(plan.indexOf("Aggregate", semiIdx) > semiIdx,
      s"semi-join key set must be the aggregated order totals:\n$plan")
  }
}
