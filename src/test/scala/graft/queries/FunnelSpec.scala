package graft.queries

import graft.SparkSpec

class FunnelSpec extends SparkSpec {

  test("funnel steps shrink monotonically and stay within the user count") {
    val r = Funnel.qFunnel(spark, sf001).collect()(0)
    val (n, s1, s2, s3) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n > 0)
    assert(n >= s1 && s1 >= s2 && s2 >= s3,
      s"ordered funnel must be monotone: $n >= $s1 >= $s2 >= $s3")
    assert(s3 > 0, "the 30-day corpus should convert some users end-to-end")
    assert(r.getLong(4) <= r.getLong(5),
      "first signup must precede the last completed purchase")
  }

  test("funnel step times respect ordering and the 7-day step window") {
    // Re-derive the per-user step rows (pre-aggregation) and check the
    // chain property on every user row.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val byUser = Window.partitionBy("user_id")
    val week = 604800000000L
    val rows = Analytics.loadEvents(spark, sf001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("te"))
      .withColumn("t1", min(when(col("event_type") === "signup", col("te"))).over(byUser))
      .withColumn("t2", min(when(col("event_type") === "view" &&
        col("te") > col("t1") && col("te") <= col("t1") + week, col("te"))).over(byUser))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("te") > col("t2") && col("te") <= col("t2") + week, col("te"))).over(byUser))
      .select("user_id", "t1", "t2", "t3").distinct().collect()
    rows.foreach { r =>
      if (!r.isNullAt(2)) {
        assert(!r.isNullAt(1), "t2 requires t1")
        assert(r.getLong(2) > r.getLong(1) && r.getLong(2) <= r.getLong(1) + week)
      }
      if (!r.isNullAt(3)) {
        assert(!r.isNullAt(2), "t3 requires t2")
        assert(r.getLong(3) > r.getLong(2) && r.getLong(3) <= r.getLong(2) + week)
      }
    }
  }

  test("range frame includes peer rows that a rows frame would split") {
    import org.apache.spark.sql.expressions.Window
    // Two events at the SAME µs: a RANGE frame puts each in the
    // other's window (peers enter together); ROWS(-1..0) would not.
    val df = spark.createDataFrame(Seq(
      (1L, 10L, 1.0), (1L, 10L, 2.0), (1L, 5000000000L, 4.0)
    )).toDF("user_id", "te", "value")
    val w = Window.partitionBy("user_id").orderBy("te")
      .rangeBetween(-3600000000L, Window.currentRow)
    val rows = df.withColumn("n_win", org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).over(w))
      .select("te", "n_win").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(rows == Set(10L -> 2L, 5000000000L -> 1L),
      s"peer rows must share the range frame; far row stands alone: $rows")
  }

  test("retention cell (cohort, 0) equals the cohort's size and offsets are bounded") {
    val cells = Funnel.qRetention(spark, sf001).collect()
    assert(cells.nonEmpty)
    cells.foreach { c => assert(c.getLong(1) >= 0, "offsets are relative to the cohort week") }
    // Week-0 cell of each cohort = every user whose FIRST event is in
    // that week is by definition active in it = cohort size; later
    // offsets can never exceed it.
    val byCohort = cells.groupBy(_.getLong(0))
    byCohort.foreach { case (cw, rows) =>
      val week0 = rows.find(_.getLong(1) == 0L)
      assert(week0.isDefined, s"cohort $cw must have a week-0 cell")
      val size = week0.get.getLong(2)
      rows.foreach { r =>
        assert(r.getLong(2) <= size,
          s"cohort $cw offset ${r.getLong(1)}: retained ${r.getLong(2)} > cohort size $size")
      }
    }
    // Distinct users summed over cohorts' week-0 cells = all users.
    val totalUsers = Analytics.loadEvents(spark, sf001)
      .select("user_id").distinct().count()
    val cohortSum = byCohort.values.map(_.find(_.getLong(1) == 0L).get.getLong(2)).sum
    assert(cohortSum == totalUsers, s"cohorts must partition users: $cohortSum != $totalUsers")
  }
}
