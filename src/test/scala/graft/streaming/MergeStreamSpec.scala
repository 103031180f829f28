package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeStreamSpec extends SparkSpec {

  test("chunked CDC apply equals the all-changes-at-once merge, across real micro-batches") {
    val got = MergeStream.runMergeBounded(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq

    // the all-at-once reference: base ∪ full feed, latest wins
    val base = spark.read.parquet(s"$sf001/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"),
        lit(0L).as("version"), lit(false).as("is_delete"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderkey").orderBy(col("version").desc)
    val expected = base.unionByName(MergeStream.changeFeed(spark, sf001))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(!col("is_delete"))
      .select("o_orderkey", "o_totalprice", "version")
      .orderBy("o_orderkey").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == expected)

    // version-2 re-updates must have superseded version-1 updates
    val v2 = got.filter(_._3 == 2L)
    assert(v2.nonEmpty && v2.forall(_._1 % 1000 == 3), "wave-2 keys must win at version 2")

    // the maxFilesPerTrigger=1 run must actually have reconciled
    // multiple micro-batches (state-0..state-N on disk, N >= 1) —
    // otherwise cross-batch state carry was never exercised
    val stateRoot = java.nio.file.Paths.get(MergeStream.lastStateRoot)
    val states = java.nio.file.Files.list(stateRoot).iterator()
    val names = Iterator.continually(states).takeWhile(_.hasNext).map(_.next().getFileName.toString).toSet
    assert(names.count(_.startsWith("state-")) >= 3,
      s"expected multiple micro-batch states, saw $names")
  }
}
