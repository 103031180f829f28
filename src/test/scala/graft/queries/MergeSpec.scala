package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {

  test("merge applies every change class and touches nothing else") {
    val base = spark.read.parquet(s"$sf001/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val merged = Merge.qMergeUpsert(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap

    val updated = base.keys.filter(_ % 1000 == 3)
    val deleted = base.keys.filter(_ % 1000 == 4)
    val inserted = base.keys.filter(_ % 1000 == 5)
    assert(updated.nonEmpty && deleted.nonEmpty && inserted.nonEmpty,
      "every change class must have a non-empty planted footprint")

    updated.foreach { k =>
      assert(merged(k) == ((base(k) + 1000, 1L)), s"update lost at $k") }
    deleted.foreach { k =>
      assert(!merged.contains(k), s"tombstoned key $k survived") }
    inserted.foreach { k =>
      assert(merged(k + 600000000L) == ((base(k), 1L)), s"insert lost at $k") }
    base.keys.filterNot(k => k % 1000 == 3 || k % 1000 == 4).foreach { k =>
      assert(merged(k) == ((base(k), 0L)), s"untouched key $k changed") }
    assert(merged.size == base.size - deleted.size + inserted.size)
  }

  test("merge plans one shuffle and a WindowGroupLimit top-1, not a full per-key sort") {
    val p = Merge.qMergeUpsert(spark, sf001).queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rn=1 cut must run as WindowGroupLimit:\n$p")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"expected exactly one hash exchange for the merge, got $hashExchanges:\n$p")
  }
}
