package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GroupingIdSpec extends SparkSpec {

  test("both kinds of NULL cell exist and only grouping() separates them") {
    val rows = GroupingId.qGroupingId(spark, sf0001).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))

    // real-NULL data groups: st NULL but g_st = 0
    val dataNulls = rows.filter(r => r._2.isEmpty && r._4 == 0L && r._3 == 0L)
    // subtotal rows: st NULL because rolled up (g_st = 1), per priority
    val subtotals = rows.filter(r => r._2.isEmpty && r._4 == 1L && r._3 == 0L)
    assert(dataNulls.nonEmpty, "planted real-NULL status groups must appear")
    assert(subtotals.nonEmpty, "per-priority subtotal rows must appear")

    // a value-only consumer would merge them wrongly: for some priority both
    // cells exist and the subtotal strictly exceeds the NULL data group
    val byPri = dataNulls.map(r => r._1 -> r._6).toMap
    assert(subtotals.exists(s => byPri.get(s._1).exists(_ < s._6)),
      "subtotal and data-NULL cells must coexist with different counts")

    // gid is the bitmask of the flags; grand total has gid 3 and the full n
    rows.foreach(r => assert(r._5 == 2 * r._3 + r._4))
    val grand = rows.filter(_._5 == 3L)
    val n = spark.read.parquet(s"$sf0001/orders.parquet").count()
    assert(grand.length == 1 && grand.head._6 == n)

    // conservation: leaf cells sum to the grand total
    assert(rows.filter(_._5 == 0L).map(_._6).sum == n)
  }

  test("plan: rollup is one Expand + one aggregate — no join, no second scan") {
    val p = GroupingId.qGroupingId(spark, sf0001).queryExecution.executedPlan.toString
    assert(p.contains("Expand"), s"rollup rides Expand:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 1 && !p.contains("Join"),
      s"one scan, no join:\n$p")
  }
}
