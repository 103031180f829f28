package graft.queries

import graft.SparkSpec

class RateSpikeSpec extends SparkSpec {

  test("planted burst hours flag, their neighbors do not") {
    val rows = RateSpike.qRateSpike(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap

    val planted = rows.keys.filter(_ % 97 == 13)
    assert(planted.nonEmpty, "the corpus span must contain planted burst hours past warm-up")
    planted.foreach { h =>
      assert(rows(h)._3, s"planted burst hour $h must flag as a spike") }
    // every flagged hour satisfies the exact integer inequality, and
    // unflagged hours fail it — the flag is the arithmetic, not a model
    rows.foreach { case (h, (n, trail, spike)) =>
      assert(spike == (n * 24 > trail * 3), s"flag at $h inconsistent") }
    // non-planted hours: natural traffic must not spike 3x (otherwise
    // the planted contrast proves nothing)
    val falsePos = rows.collect { case (h, (_, _, true)) if h % 97 != 13 => h }
    assert(falsePos.isEmpty, s"unexpected natural spikes at $falsePos")
  }
}
