package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalMergeSpec extends SparkSpec {

  test("merged spans equal the driver-side interval-union replay") {
    val out = IntervalMerge.qIntervalMerge(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    val half = 10L * 60 * 1000000
    val expected = Analytics.loadEvents(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("te")).collect()
      .map(r => (r.getLong(0), r.getLong(1) - half, r.getLong(1) + half))
      .groupBy(_._1).map { case (u, ivs) =>
        val sorted = ivs.map(i => (i._2, i._3)).sortBy(identity)
        val spans = sorted.foldLeft(List.empty[(Long, Long)]) {
          case (acc, (s, e)) => acc match {
            case (ms, me) :: tail if s <= me => (ms, math.max(me, e)) :: tail
            case _ => (s, e) :: acc
          }
        }
        val lens = spans.map { case (s, e) => e - s }
        u -> (spans.length.toLong, lens.sum, lens.max)
      }
    assert(out == expected, "span census must equal the fold-merge replay")

    // overlap actually deduplicates: union length < naive sum for someone
    val naive = Analytics.loadEvents(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1) * 2 * half).toMap
    assert(out.exists { case (u, (_, covered, _)) => covered < naive(u) },
      "some user must have overlapping intervals merged")
  }

  test("plan: ONE user_id exchange feeds windows, span collapse, and rollup") {
    val p = IntervalMerge.qIntervalMerge(spark, sf0001).queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"expected a single user_id hash exchange end to end, got $hashExchanges:\n$p")
    assert(!p.contains("Join"), s"interval union needs no self-join:\n$p")
  }
}
