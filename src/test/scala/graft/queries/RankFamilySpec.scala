package graft.queries

import graft.SparkSpec

class RankFamilySpec extends SparkSpec {

  test("relative ranks satisfy their defining identities per nation") {
    val rows = RankFamily.qPercentRankCume(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val n = g.length
      g.foreach { case (_, _, rnk, drnk, pr, cd) =>
        val expectPr = if (n == 1) 0.0 else math.rint((rnk - 1).toDouble / (n - 1) * 1e6) / 1e6
        assert(pr == expectPr, s"percent_rank identity: $pr vs $expectPr (rank $rnk of $n)")
        val expectCd = math.rint(rnk.toDouble / n * 1e6) / 1e6 // total order: peers = self
        assert(cd == expectCd, s"cume_dist identity: $cd vs $expectCd")
        assert(drnk <= rnk, "dense_rank never exceeds rank")
      }
      assert(g.map(_._3).sorted.toSeq == (1L to n).toSeq, "total order: ranks are 1..n")
    }
  }

  test("plan: one Window operator and one exchange serve all four functions") {
    val plan = RankFamily.qPercentRankCume(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("Window ".r.findAllIn(plan).size == 1,
      s"all four rank functions must share ONE Window node:\n$plan")
  }
}
