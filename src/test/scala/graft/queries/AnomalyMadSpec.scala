package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnomalyMadSpec extends SparkSpec {

  private def lowerMedian(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s(((xs.size + 1) / 2) - 1)
  }

  private def brute(): Map[String, (Long, Long, Long, Long)] = {
    val v = Analytics.loadEvents(spark, sf0001)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    v.groupBy(_._1).map { case (t, rows) =>
      val xs = rows.map(_._2).toSeq
      val med = lowerMedian(xs)
      val devs = xs.map(x => math.abs(x - med))
      val mad = lowerMedian(devs)
      t -> (xs.size.toLong, med, mad, devs.count(_ > 3 * mad).toLong)
    }
  }

  test("median, MAD, and outlier counts equal the naive order-statistic replay") {
    val out = AnomalyMad.qAnomalyMad(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val expected = brute()
    assert(out == expected,
      "histogram formulation must equal the sorted-sequence replay")
  }

  test("histogram route is corpus-invariant: doubling every row fixes med/MAD") {
    // medians of a duplicated multiset are unchanged (rank scales with n)
    // and outlier counts exactly double — a structural identity the
    // frequency-table cumsum must honor.
    val base = AnomalyMad.qAnomalyMad(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val ev = Analytics.loadEvents(spark, sf0001)
    val doubled = ev.union(ev)
    val tmp = graft.util.TempDirs.forInput(sf0001, "madx")
    doubled.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = AnomalyMad.qAnomalyMad(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    base.foreach { case (t, (n, med, mad, out0)) =>
      val (n2, med2, mad2, out2) = out(t)
      assert(n2 == 2 * n && med2 == med && mad2 == mad && out2 == 2 * out0,
        s"$t: doubling must fix med/MAD and double counts — " +
          s"got ($n2,$med2,$mad2,$out2) from ($n,$med,$mad,$out0)")
    }
  }

  test("plan: windows consume the histogram, never raw events") {
    val p = AnomalyMad.qAnomalyMad(spark, sf0001)
      .queryExecution.executedPlan.toString
    // every Window sits above an aggregate — the domain-bounded
    // discipline: cumsum rows = |domain|, not |corpus|
    val winIdx = p.linesIterator.zipWithIndex.filter(_._1.contains("Window")).map(_._2)
    assert(winIdx.nonEmpty, s"expected cumsum windows:\n$p")
    val aggBelow = p.linesIterator.toSeq
    winIdx.foreach { i =>
      assert(aggBelow.drop(i).exists(_.contains("HashAggregate")),
        s"window at line $i must consume an aggregated histogram:\n$p")
    }
  }
}
