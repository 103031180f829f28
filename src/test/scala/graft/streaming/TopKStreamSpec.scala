package graft.streaming

import graft.SparkSpec
import graft.queries.Analytics

class TopKStreamSpec extends SparkSpec {

  test("chunked replay converges to the batch leaderboard, state chains and stays k-bounded") {
    val got = TopKStream.runTopKBounded(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val batch = Analytics.qTopKPerGroup(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == batch.toSeq, "stream state must converge to the batch top-k")

    // 8-file feed, maxFilesPerTrigger=1: the merge chained across
    // micro-batches — one brand's entries straddle files (round-robin
    // split), so a dropped carry would lose leaderboard rows
    val states = new java.io.File(TopKStream.lastStateRoot).list()
      .count(_.startsWith("state-"))
    assert(states >= 3, s"expected a chain of micro-batch states, saw $states")

    // state volume is groups*k FOREVER, never rows-seen: the final
    // snapshot on disk must hold <= 3 rows per brand
    val snap = new java.io.File(TopKStream.lastStateRoot).list()
      .filter(_.startsWith("state-")).map(_.stripPrefix("state-"))
      .filter(_.forall(_.isDigit)).map(_.toLong).max
    val stateRows = spark.read.parquet(s"${TopKStream.lastStateRoot}/state-$snap")
    val overfull = stateRows.groupBy("p_brand").count()
      .filter(org.apache.spark.sql.functions.col("count") > 3).count()
    assert(overfull == 0, "carried state must stay k-bounded per group")
  }
}
