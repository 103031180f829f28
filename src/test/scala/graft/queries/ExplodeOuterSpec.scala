package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExplodeOuterSpec extends SparkSpec {

  test("explode loses empty-array orders; explode_outer conserves every order") {
    val out = ExplodeOuter.qExplodeOuter(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    val nOrders = spark.read.parquet(s"$sf0001/orders.parquet").count()
    val hi = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_quantity") > 45).select("l_orderkey").collect()
      .map(_.getLong(0))
    val ordersWithHi = hi.distinct.length.toLong

    val (exN, exOrders, exNulls) = out("explode")
    val (ouN, ouOrders, ouNulls) = out("explode_outer")
    assert(exN == hi.length && exOrders == ordersWithHi && exNulls == 0L,
      "explode == inner unnest: element-count rows, empties vanish")
    assert(ouOrders == nOrders,
      "explode_outer must conserve every order, including empty arrays")
    assert(ouN == hi.length + (nOrders - ordersWithHi) &&
      ouNulls == nOrders - ordersWithHi,
      "each empty array contributes exactly one NULL element row")
    assert(ouOrders > exOrders,
      "the trap is real at this SF: empties must exist")
  }
}
