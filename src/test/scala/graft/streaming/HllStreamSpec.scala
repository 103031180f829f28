package graft.streaming

import graft.SparkSpec

class HllStreamSpec extends SparkSpec {

  test("union-maintained HLL state lands in the 2% band for every group and the rollup") {
    val got = HllStream.runHllBounded(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(got.nonEmpty && got.exists(_._1 == "__union"))
    assert(got.forall(_._3),
      s"every stream-maintained estimate must pass the band: ${got.mkString(", ")}")

    // users span files (round-robin feed): adding per-batch estimates
    // would overcount — the band only holds if sketches were UNIONED;
    // and the run must actually have chained micro-batch states
    val states = new java.io.File(HllStream.lastStateRoot).list()
      .count(_.startsWith("state-"))
    assert(states >= 3, s"expected a chain of micro-batch states, saw $states")
  }
}
