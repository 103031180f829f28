package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeTravelSpec extends SparkSpec {

  test("as-of census equals a brute-force latest-event-before-t replay") {
    val events = Analytics.loadEvents(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("te"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val probes = Seq("2024-01-08", "2024-01-15", "2024-01-22").map(d =>
      d -> java.time.LocalDate.parse(d).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli * 1000L)
    val expect = (for {
      (label, t) <- probes
      // .toSeq: mapping a Map to (label, state) pairs would rebuild a
      // Map keyed by label and silently dedup to one user per probe
      (_, byUser) <- events.filter(_._4 <= t).groupBy(_._1).toSeq
    } yield {
      val latest = byUser.maxBy(e => (e._4, e._2))
      (label, latest._3)
    }).groupBy(identity).map { case ((l, s), xs) => (l, s, xs.size.toLong) }
      .toSeq.sorted
    val got = TimeTravel.qTimeTravel(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(got == expect, "interval containment must equal the ranked-log definition")
    // every probe must see every active user exactly once
    for ((label, t) <- probes) {
      val active = events.filter(_._4 <= t).map(_._1).distinct.length.toLong
      assert(got.filter(_._1 == label).map(_._3).sum == active,
        s"snapshot at $label must cover each active user exactly once")
    }
  }
}
