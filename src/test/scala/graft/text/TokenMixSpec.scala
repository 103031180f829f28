package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenMixSpec extends SparkSpec {

  test("every source fills the token budget greedily without exceeding it") {
    val rows = TokenMix.corpusMixTokens(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 20, "all twenty sources survive rebalancing")
    val b = rows.head._4
    assert(rows.forall(_._4 == b), "one shared budget")
    rows.foreach { case (src, nDocs, kept, budget, fillBp) =>
      assert(kept <= budget, s"$src must not exceed the budget")
      assert(fillBp == kept * 10000 / budget)
      assert(nDocs >= 1)
    }
    // the budget source itself fills to exactly 100%
    assert(rows.exists(_._5 == 10000L), "the smallest source is kept whole")

    // greedy maximality: adding the NEXT doc of any non-full source
    // would cross the budget (driver-side check against raw tokens)
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("source"), col("doc_id"),
        TextOps.bpeishTokenCount(col("text")).cast("long").as("nt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySrc = toks.groupBy(_._1)
    rows.foreach { case (src, nDocs, kept, budget, _) =>
      val ordered = bySrc(src).sortBy(_._2).map(_._3)
      if (nDocs < ordered.length)
        assert(kept + ordered(nDocs.toInt) > budget,
          s"$src kept a shorter prefix than the budget allows")
    }
  }

  test("weighted token targets: exact driver-side replay, shares track the parts") {
    val out = TokenMix.corpusMixTokensWeighted(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.length == 20, "all twenty sources survive weighted rebalancing")

    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("source"), col("doc_id"),
        TextOps.bpeishTokenCount(col("text")).cast("long").as("nt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val totals = toks.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._3).sum }
    val w = totals.keys.map(s => s -> (if (s.drop(3).toInt < 5) 2L else 1L)).toMap
    val p = w.values.sum
    val t = totals.map { case (s, tot) => tot * p / w(s) }.min
    val expected = totals.keys.toSeq.sorted.map { s =>
      val budget = w(s) * t / p
      assert(budget <= totals(s), s"$s budget must be achievable")
      val ordered = toks.filter(_._1 == s).sortBy(_._2).map(_._3)
      var cum = 0L; var n = 0L; var kept = 0L
      ordered.foreach { nt => cum += nt; if (cum <= budget) { n += 1; kept += nt } }
      (s, w(s), n, kept, budget)
    }
    val keptTotal = expected.map(_._4).sum
    expected.zip(out.sortBy(_._1)).foreach { case ((s, ws, n, kept, budget), o) =>
      assert((o._1, o._2, o._3, o._4, o._5) == ((s, ws, n, kept, budget)),
        s"$s weighted census must equal the driver replay")
      assert(o._6 == kept * 10000 / keptTotal, s"$s share in basis points")
    }
    // the recipe is visible in the output: every 2-part source out-shares
    // every 1-part source (budgets differ 2x; fills are near-budget)
    val w2 = out.filter(_._2 == 2L).map(_._6)
    val w1 = out.filter(_._2 == 1L).map(_._6)
    assert(w2.nonEmpty && w1.nonEmpty && w2.min > w1.max,
      "2-part sources must out-share 1-part sources")
  }
}
