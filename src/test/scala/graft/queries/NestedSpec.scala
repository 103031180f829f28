package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NestedSpec extends SparkSpec {

  test("q_listagg joins each customer's keys in numeric order with exact counts") {
    val got = Nested.qListagg(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    assert(got.length == orders.size)
    got.foreach { case (c, n, keys) =>
      val expected = orders(c).map(_._2).sorted
      assert(n == expected.length, s"customer $c count")
      assert(keys == expected.mkString(","), s"customer $c key list")
    }
  }

  test("packed item arrays are linenumber-ordered and fold to the flat sums") {
    val packed = spark.read.parquet(s"$sf001/lineitem.parquet")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(struct(
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice")))).as("items"))
    val rows = packed.orderBy("l_orderkey").limit(200).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val items = r.getSeq[org.apache.spark.sql.Row](1)
      // linenumbers can repeat in the synthetic data; the sort is
      // full-struct lexicographic, so equal-linenumber items order by
      // the remaining fields — non-decreasing is the invariant.
      val lns = items.map(_.getInt(0))
      assert(lns == lns.sorted,
        s"order ${r.getLong(0)}: items must be linenumber-ordered: $lns")
    }
    val flat = spark.read.parquet(s"$sf001/lineitem.parquet")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val folded = r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1)).sum
      assert(folded == flat(r.getLong(0)),
        s"order ${r.getLong(0)}: array fold $folded != flat sum ${flat(r.getLong(0))}")
    }
  }

  test("bucketed totals cover every lineitem exactly once") {
    val out = Nested.qNested(spark, sf001).collect()
    val nLines = spark.read.parquet(s"$sf001/lineitem.parquet").count()
    assert(out.map(r => r.getInt(0) * r.getLong(1)).sum == nLines,
      "sum over (n_items x n_orders) buckets must equal the lineitem count")
  }
}
