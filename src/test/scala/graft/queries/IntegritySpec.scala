package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntegritySpec extends SparkSpec {

  test("every check counts exactly its planted violations, and nothing else") {
    val report = Integrity.qIntegrity(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
    val corruptOrders = orders.filter(col("o_orderkey") % 1000 === 0).count()
    val dupKeys = orders.filter(col("o_orderkey") % 1000 === 1)
      .select("o_orderkey").distinct().count()
    val corruptLines = lineitem.filter(col("l_orderkey") % 1000 === 2).count()

    assert(corruptOrders > 0 && dupKeys > 0 && corruptLines > 0,
      "the planted slices must be non-empty for the checks to be load-bearing")
    assert(report("orphan_orders") == corruptOrders)
    assert(report("bad_order_price") == corruptOrders)
    assert(report("null_order_date") == corruptOrders)
    assert(report("duplicate_orderkeys") == dupKeys)
    assert(report("orphan_lineitems") == corruptLines)
    assert(report("bad_lineitem_qty") == corruptLines)
    assert(report("bad_lineitem_discount") == corruptLines)
    assert(report.size == 7)
  }

  test("the clean corpus alone reports zero violations") {
    // Re-run the same checks with planting disabled by construction:
    // the base tables must be violation-free, proving the nonzero
    // counts above come from the plants and only the plants.
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
    val customer = spark.read.parquet(s"$sf001/customer.parquet")
    assert(lineitem.join(orders,
      col("l_orderkey") === col("o_orderkey"), "left_anti").count() == 0)
    assert(orders.join(customer,
      col("o_custkey") === col("c_custkey"), "left_anti").count() == 0)
    assert(orders.groupBy("o_orderkey").count().filter(col("count") > 1).count() == 0)
    assert(orders.filter(col("o_totalprice") <= 0 || col("o_orderdate").isNull).count() == 0)
    assert(lineitem.filter(col("l_quantity") <= 0 ||
      col("l_discount") < 0 || col("l_discount") > 1).count() == 0)
  }
}
