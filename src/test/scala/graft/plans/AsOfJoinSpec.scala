package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("asof join picks the latest right row at or before the left time") {
    import spark.implicits._
    val quotes = Seq(
      ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 9L, 12.0),
      ("B", 4L, 20.0)
    ).toDF("sym_q", "t_q", "px")
    val trades = Seq(
      ("A", 0L), ("A", 5L), ("A", 7L), ("A", 100L),
      ("B", 3L), ("B", 4L)
    ).toDF("sym", "t")

    val out = AsOf.join(trades, quotes,
        Seq(trades("sym")), Seq(quotes("sym_q")), trades("t"), quotes("t_q"))
      .select("sym", "t", "t_q", "px")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
      .toSet

    assert(out == Set(
      ("A", 0L, -1L, -1.0),    // nothing at or before t=0
      ("A", 5L, 5L, 11.0),     // ties: <= is inclusive
      ("A", 7L, 5L, 11.0),
      ("A", 100L, 9L, 12.0),   // latest available
      ("B", 3L, -1L, -1.0),
      ("B", 4L, 4L, 20.0)))
  }

  test("tolerance drops matches staler than the bound") {
    import spark.implicits._
    val quotes = Seq(
      ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 9L, 12.0)
    ).toDF("sym_q", "t_q", "px")
    val trades = Seq(
      ("A", 2L), ("A", 5L), ("A", 8L), ("A", 100L)
    ).toDF("sym", "t")
    val out = AsOf.join(trades, quotes,
        Seq(trades("sym")), Seq(quotes("sym_q")), trades("t"), quotes("t_q"),
        tolerance = Some(2L))
      .select("t", "t_q")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(out == Set(
      (2L, 1L),     // gap 1 <= 2
      (5L, 5L),     // exact tie, gap 0
      (8L, -1L),    // latest is t_q=5, gap 3 > 2 -> NO match (not the older one)
      (100L, -1L))) // gap 91 > 2
    // tolerance = Some(0) keeps only exact-time matches
    val exact = AsOf.join(trades, quotes,
        Seq(trades("sym")), Seq(quotes("sym_q")), trades("t"), quotes("t_q"),
        tolerance = Some(0L))
      .select("t", "t_q")
      .collect().count(r => !r.isNullAt(1))
    assert(exact == 1) // only (5, 5)
  }

  test("null times: left nulls never match, right nulls are unmatchable") {
    import spark.implicits._
    val right = Seq(("A", Some(1L), 10.0), ("A", None, 99.0), ("A", Some(5L), 11.0))
      .toDF("sk", "tk", "px")
    val left = Seq(("A", Some(3L)), ("A", None), ("A", Some(6L)))
      .toDF("s", "t")
    val out = AsOf.join(left, right, Seq(left("s")), Seq(right("sk")), left("t"), right("tk"))
      .select("t", "tk", "px")
      .collect().map(r => (
        if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
    assert(out == Set(
      (-1L, -1L, -1.0),   // null left time -> no match
      (3L, 1L, 10.0),
      (6L, 5L, 11.0)))    // the null-time right row is skipped, not matched
  }

  test("asof join agrees with the composed join+window formulation on real tables") {
    val events = graft.queries.Analytics.loadEvents(spark, sf0001)
      .select(col("event_id"), pmod(col("user_id"), lit(50)).as("k"),
        col("ts").cast("long").as("t"))
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), pmod(col("o_custkey"), lit(50)).as("k2"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("t2"))

    val fast = AsOf.join(events, orders,
        Seq(events("k")), Seq(orders("k2")), events("t"), orders("t2"))
      .select("event_id", "o_orderkey")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    // reference composition: equi-join, filter, keep max-(t2, orderkey).
    // NOTE the custom operator breaks time ties by right sort order
    // (keys, time) — the last row among equal times wins, which for
    // this data is the max orderkey: mirror that here.
    val w = Window.partitionBy("event_id").orderBy(desc("t2"), desc("o_orderkey"))
    val slow = events.join(orders, events("k") === orders("k2") && orders("t2") <= events("t"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "o_orderkey")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(fast.size == slow.size)
    val diffs = fast.collect { case (k, v) if slow(k) != v => (k, v, slow(k)) }
    assert(diffs.isEmpty, s"${diffs.take(5)}")
  }

  test("forward direction via time negation equals the brute earliest-at-or-after composition") {
    import spark.implicits._
    import graft.queries.Analytics
    val ev = Analytics.loadEvents(spark, sf0001)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id").as("k"), unix_micros(col("ts")).as("t"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("k2"), unix_micros(col("ts")).as("t2"))
      .agg(max("event_id").as("pid"))
    // brute: per view, min-(t2) purchase at-or-after; ties cannot occur
    // (purchases pre-aggregated to unique (user, time))
    val w = Window.partitionBy("event_id").orderBy(asc("t2"), asc("pid"))
    val slow = views.join(purchases,
        views("k") === purchases("k2") && purchases("t2") >= views("t"), "left")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("event_id", "pid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val vn = views.select(col("event_id"), col("k"), (-col("t")).as("tn"))
    val pn = purchases.select(col("k2"), (-col("t2")).as("t2n"), col("pid"))
    val fast = AsOf.join(vn, pn, Seq(vn("k")), Seq(pn("k2")), vn("tn"), pn("t2n"))
      .select("event_id", "pid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(fast == slow)
    assert(fast.values.exists(_ >= 0) && fast.values.exists(_ == -1L),
      "both matched and unmatched views must occur or the direction isn't exercised")
  }
}
