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

  test("the global-order window provably consumes the |hours| pre-aggregate, not raw events") {
    val df = RateSpike.qRateSpike(spark, sf001)
    df.collect()
    // plan structure: linear chain scan → hourly HashAggregate → Window,
    // so in the printed tree the Window line precedes the aggregate
    // which precedes the events scan — the window never sees raw rows
    val lines = df.queryExecution.executedPlan.toString.linesIterator.toVector
    val iWin = lines.indexWhere(_.contains("Window"))
    assert(iWin >= 0, "expected a Window operator")
    val iAgg = lines.indexWhere(_.contains("HashAggregate"), iWin)
    val iScan = lines.indexWhere(l => l.contains("Scan parquet") || l.contains("FileScan"), iWin)
    assert(iAgg >= 0 && iScan >= 0 && iWin < iAgg && iAgg < iScan,
      s"window input must be the hourly aggregate, not raw events:\n${lines.mkString("\n")}")
    // measured bound: the series cardinality tracks the TIME SPAN, not
    // the corpus — 10× the data may not grow the window input beyond
    // the densified span (and it stays tiny vs the event count)
    def hours(sf: String) =
      RateSpike.plantedEvents(spark, sf).select("h").distinct().count()
    val hSmall = hours(sf0001)
    val hBig = hours(sf001)
    val nBig = Analytics.loadEvents(spark, sf001).count()
    assert(hBig <= (hSmall * 3) / 2,
      s"hour-series cardinality must be span-bounded: $hSmall → $hBig at 10× data")
    assert(hBig * 10 < nBig,
      s"window input ($hBig rows) must be far below the corpus ($nBig rows)")
  }
}
