package graft.svm

import graft.SparkSpec

class FeatureAucSpec extends SparkSpec {

  test("per-dimension AUC equals a naive pairwise concordance count") {
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("label = 0 as pos", "embedding").collect()
      .map(r => (r.getBoolean(0), r.getSeq[Float](1).map(_.toDouble)))

    val got = FeatureAuc.featureAuc(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.size == 8)

    (0 until 8).foreach { d =>
      val pos = rows.filter(_._1).map(_._2(d))
      val neg = rows.filterNot(_._1).map(_._2(d))
      // AUC = P(score_pos > score_neg) + 0.5 P(tie), counted exactly
      var num = 0.0
      for (p <- pos; n <- neg)
        num += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
      val expected = num / (pos.length.toLong * neg.length)
      val (auc, nPos, nNeg) = got(d.toLong)
      assert(nPos == pos.length && nNeg == neg.length)
      assert(math.abs(auc - expected) < 1e-12, s"dim $d: $auc vs $expected")
      assert(auc > 0 && auc < 1)
    }
  }
}
