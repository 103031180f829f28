package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimelineSpec extends SparkSpec {

  /** Per-user event stream recomputed naively on the driver — the
    * independent ground truth both operators are checked against.
    */
  private def timelines(): Map[Long, Seq[(Long, String, Long, Double)]] =
    Analytics.loadEvents(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("te"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .groupBy(_._1)
      .map { case (u, rows) =>
        u -> rows.map(r => (r._2, r._3, r._4, r._5)).sortBy(r => (r._3, r._1)).toSeq
      }

  test("q_scd2 reproduces a naive per-user run compression exactly") {
    val got = Timeline.qScd2(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getBoolean(5), r.getLong(6))).toMap

    val expected = timelines().flatMap { case (u, evs) =>
      // compress consecutive same-state runs in (te, event_id) order
      val runs = evs.foldLeft(Vector.empty[(String, Long, Long)]) {
        case (acc, (_, state, te, _)) =>
          if (acc.nonEmpty && acc.last._1 == state)
            acc.init :+ ((state, acc.last._2, acc.last._3 + 1))
          else acc :+ ((state, te, 1L))
      }
      runs.zipWithIndex.map { case ((state, from, n), i) =>
        val to = if (i + 1 < runs.size) Some(runs(i + 1)._2) else None
        (u, (i + 1).toLong) -> ((state, from, to, to.isEmpty, n))
      }
    }
    assert(got.size == expected.size)
    expected.foreach { case (k, v) => assert(got(k) == v, s"mismatch at $k") }
    // structural invariants the naive recompute also implies, stated
    // loudly: versions contiguous from 1, exactly one open interval
    // per user, adjacent runs change state
    val byUser = got.keys.groupBy(_._1)
    byUser.foreach { case (u, ks) =>
      assert(ks.map(_._2).toSeq.sorted == (1L to ks.size).toSeq, s"user $u versions")
      assert(got.count { case ((uu, _), v) => uu == u && v._4 } == 1, s"user $u current")
    }
  }

  test("q_transition counts exactly the consecutive per-user bigrams") {
    val expected = timelines().toSeq.flatMap { case (_, evs) =>
      evs.map(_._2).sliding(2).collect { case Seq(a, b) => (a, b) }
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val fromTotals = expected.groupBy(_._1._1)
      .map { case (f, m) => f -> m.values.sum }

    val got = Timeline.qTransition(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, n) =>
      assert(got(k)._1 == n, s"count at $k")
      assert(got(k)._2 == n.toDouble / fromTotals(k._1), s"probability at $k")
    }
  }

  test("q_gapfill fills every silent hour with the last observed value") {
    val hourUs = 3600000000L
    val baseUs = 1704067200000000L
    val got = Timeline.qGapfill(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap

    timelines().foreach { case (u, evs) =>
      val byHour = evs.groupBy(e => (e._3 - baseUs) / hourUs)
      val obs = byHour.map { case (h, es) => h -> (es.map(_._4).max, es.size.toLong) }
      val (hmin, hmax) = (obs.keys.min, obs.keys.max)
      // spine is contiguous [hmin, hmax] and nothing else
      assert(got.keys.filter(_._1 == u).map(_._2).toSeq.sorted == (hmin to hmax).toSeq,
        s"user $u spine")
      var carry = obs(hmin)._1
      (hmin to hmax).foreach { h =>
        obs.get(h).foreach(o => carry = o._1)
        val (nObs, v, isObs) = got((u, h))
        assert(isObs == obs.contains(h), s"user $u hour $h observed flag")
        assert(nObs == obs.get(h).map(_._2).getOrElse(0L), s"user $u hour $h n_obs")
        assert(v == carry, s"user $u hour $h carried value")
      }
    }
  }
}
