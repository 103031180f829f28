package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequenceMatchSpec extends SparkSpec {

  private def brute(): Map[Long, (Long, Long, Long, Long)] = {
    val ev = Analytics.loadEvents(spark, sf0001)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    ev.groupBy(_._1).map { case (u, rows) =>
      val seq = rows.sortBy(r => (r._2.getTime / 1000, r._2.getNanos, r._3))
        .map(_._4.head).mkString
      val browseBuy = "vc*p".r.findAllIn(seq).size.toLong
      val bursts = "e{2,}".r.findAllIn(seq).size.toLong
      val maxRun = "e+".r.findAllIn(seq).map(_.length).foldLeft(0)(math.max).toLong
      u -> (seq.length.toLong, browseBuy, bursts, maxRun)
    }
  }

  test("per-user pattern counts equal the driver-side regex replay") {
    val out = SequenceMatch.qSequenceMatch(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val expected = brute()
    assert(out == expected, "operator must equal the Scala-regex replay")
    // the patterns must actually fire at test SF or the row proves nothing
    assert(out.values.map(_._2).sum > 0, "browse-buy pattern never matched")
    assert(out.values.map(_._3).sum > 0, "error-burst pattern never matched")
  }

  test("burst count and max run are consistent: maxRun >= 2 iff bursts > 0") {
    SequenceMatch.qSequenceMatch(spark, sf0001).collect().foreach { r =>
      val (bursts, maxRun) = (r.getLong(3), r.getLong(4))
      assert((bursts > 0) == (maxRun >= 2),
        s"user ${r.getLong(0)}: bursts=$bursts maxRun=$maxRun must agree")
    }
  }

  test("plan: one user exchange, order restored in the aggregate, no Window") {
    val p = SequenceMatch.qSequenceMatch(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"CEP ordering must not need a Window:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"exactly one user_id exchange:\n$p")
  }
}
