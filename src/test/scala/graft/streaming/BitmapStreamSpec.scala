package graft.streaming

import graft.SparkSpec
import graft.queries.Sketches

class BitmapStreamSpec extends SparkSpec {

  test("OR-maintained bitmap state converges to the batch census across micro-batches") {
    val got = BitmapStream.runBitmapBounded(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Sketches.qBitmapDistinct(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == batch, "incremental OR-maintenance must equal the all-at-once census")

    // users span files (round-robin feed): summing batch counts would
    // overcount, so equality above only holds if sets were OR-ed; and
    // the run must actually have chained several micro-batch states
    val states = new java.io.File(BitmapStream.lastStateRoot).list()
      .count(_.startsWith("state-"))
    assert(states >= 3, s"expected a chain of micro-batch states, saw $states")
  }
}
