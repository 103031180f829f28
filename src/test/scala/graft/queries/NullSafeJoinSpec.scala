package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NullSafeJoinSpec extends SparkSpec {

  test("= drops NULL keys, <=> routes them to the NULL label; counts exact") {
    val out = NullSafeJoin.qNullSafeJoin(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    val sts = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_orderstatus").collect()
      .map(r => if (r.getLong(0) % 13 == 6) None else Some(r.getString(1)))
    val byLabel = sts.groupBy {
      case Some(s) => s"L_$s"
      case None    => "L_NULL"
    }.map { case (l, v) => l -> v.length.toLong }

    val nNull = sts.count(_.isEmpty).toLong
    assert(nNull > 0, "planted NULL keys must exist")
    // null-safe census covers every row, including the NULL label
    assert(out.collect { case (("null_safe", l), n) => l -> n }.toMap == byLabel)
    // equality census misses exactly the NULL-keyed rows
    assert(!out.contains(("eq", "L_NULL")), "= must never match a NULL key")
    assert(out.collect { case (("eq", _), n) => n }.sum == sts.length - nNull)
    assert(out.collect { case (("null_safe", _), n) => n }.sum == sts.length)
  }

  test("plan: both variants broadcast the tiny label dim") {
    val p = NullSafeJoin.qNullSafeJoin(spark, sf0001).queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2,
      s"both joins must broadcast the dim:\n$p")
  }
}
