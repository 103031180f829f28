package graft.streaming

import graft.SparkSpec
import graft.queries.RateSpike

class RateSpikeStreamSpec extends SparkSpec {

  test("chunked streaming replay converges to the batch spike table, state chains across batches") {
    val got = RateSpikeStream.runRateSpikeBounded(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val batch = RateSpike.qRateSpike(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == batch.toSeq, "stream state must converge to the batch hourly series")
    assert(got.exists(_._4), "planted bursts must flag")
    assert(got.count(_._4) < got.length / 4, "spikes stay exceptional")

    // the feed was 8 files with maxFilesPerTrigger=1: the run must have
    // chained multiple micro-batch states (additive merge across files)
    val states = new java.io.File(RateSpikeStream.lastStateRoot).list()
      .count(_.startsWith("state-"))
    assert(states >= 3, s"expected a chain of micro-batch states, saw $states")
  }
}
