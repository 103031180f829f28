package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultiExistsSpec extends SparkSpec {

  private val nation = "NATION_7"

  /** Driver-side literal replay of the Q21 semantics. */
  private def brute(): Map[String, Long] = {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select("l_orderkey", "l_suppkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val fOrders = spark.read.parquet(s"$sf001/orders.parquet")
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
      .collect().map(_.getLong(0)).toSet
    val natKey = spark.read.parquet(s"$sf001/nation.parquet")
      .filter(col("n_name") === nation).select("n_nationkey")
      .collect().map(_.getInt(0).toLong).toSet
    val supName = spark.read.parquet(s"$sf001/supplier.parquet")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2).toLong)).toMap
    val byOrder = li.groupBy(_._1)
    li.filter { case (o, s, f) =>
      f == "R" && fOrders.contains(o) &&
        supName.get(s).exists(t => natKey.contains(t._2)) &&
        byOrder(o).exists(l2 => l2._2 != s) &&
        !byOrder(o).exists(l3 => l3._2 != s && l3._3 == "R")
    }.groupBy(t => supName(t._2)._1)
      .map { case (n, rows) => n -> rows.size.toLong }
  }

  test("numwait equals the literal EXISTS/NOT-EXISTS replay (top-10 slice)") {
    val out = MultiExists.qMultiExists(spark, sf001, nation).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val full = brute().toSeq.sortBy { case (n, w) => (-w, n) }
    assert(out.nonEmpty, "the shape must produce waiting suppliers at sf0.01")
    assert(out.toSeq == full.take(out.length),
      s"engine top-10 ${out.toSeq} != replay ${full.take(10)}")
  }

  test("SQL-text spelling through Catalyst's RewritePredicateSubquery " +
    "agrees with the stated semi/anti plan") {
    Seq("lineitem", "orders", "supplier", "nation").foreach { t =>
      spark.read.parquet(s"$sf001/$t.parquet").createOrReplaceTempView(t)
    }
    val viaSql = spark.sql(MultiExists.oracleSql).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    // oracleSql pins NATION_7 — same default as the engine call
    val viaDf = MultiExists.qMultiExists(spark, sf001, nation).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(viaSql == viaDf,
      "correlated-subquery spelling and explicit semi/anti joins must agree")
  }

  test("plan: one LEFT SEMI + one LEFT ANTI self-join, equi on l_orderkey, " +
    "no nested loop / cartesian") {
    val p = MultiExists.qMultiExists(spark, sf001, nation)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a left-semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as a left-anti join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the inequality must ride the l_orderkey equi-join, never a nested loop:\n$p")
  }

  test("plan: the nation dim filter broadcasts and lands before the self-joins") {
    val p = MultiExists.qMultiExists(spark, sf001, nation)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the nation-filtered supplier dim must broadcast:\n$p")
  }
}
