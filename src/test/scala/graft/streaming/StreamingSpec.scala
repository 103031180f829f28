package graft.streaming

import graft.SparkSpec
import graft.queries.Analytics

class StreamingSpec extends SparkSpec {

  test("bounded streaming aggregation converges to the batch result") {
    val streamed = EventStream.runBounded(spark, sf0001, queryName = "spec_stream")
      .collect().map(_.toSeq).toSet
    val batch = Analytics.qStreamAggBatch(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch, "stream/batch parity must hold on bounded input")
  }
}
