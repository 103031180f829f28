package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {

  test("per-class census equals the residue arithmetic; delta = 100 per update") {
    val out = SnapshotDiff.qSnapshotDiff(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set("added", "removed", "updated", "unchanged"),
      "every change class must have a non-empty planted footprint")

    val keys = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0))
    val added = keys.filter(_ % 1000 == 5)
    val removed = keys.filter(_ % 1000 == 4)
    val updated = keys.filter(_ % 1000 == 3)
    val unchanged = keys.filter(k => k % 1000 != 3 && k % 1000 != 4 && k % 1000 != 5)

    assert(out("added") == ((added.length.toLong, added.map(_ + 700000000L).sum, 0L)))
    assert(out("removed") == ((removed.length.toLong, removed.sum, 0L)))
    assert(out("updated")._1 == updated.length.toLong &&
      out("updated")._2 == updated.sum &&
      out("updated")._3 == 100L * updated.length,
      "every planted update moves exactly one dollar")
    // residue-5 originals stay unchanged in v2 (only their clones are new)
    assert(out("unchanged")._1 == unchanged.length.toLong + added.length)

    // conservation: v1 = unchanged + updated + removed; v2 = unchanged + updated + added
    assert(out("unchanged")._1 + out("updated")._1 + out("removed")._1 == keys.length)
  }

  test("plan: one co-partitioned full outer join (3 hash exchanges, broadcast off)") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p = SnapshotDiff.qSnapshotDiff(spark, sf0001).queryExecution.executedPlan.toString
      assert(p.contains("FullOuter"), s"diff must be a full outer join:\n$p")
      val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(hashExchanges == 3,
        s"expected one key shuffle per snapshot + the 4-key census rollup, got $hashExchanges:\n$p")
    }
  }
}
