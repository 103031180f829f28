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
}
