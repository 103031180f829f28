package graft.text

import graft.SparkSpec

class DecileLiftSpec extends SparkSpec {

  test("gains table: conservation, equal cuts, and full junk capture in the top quartile") {
    val rows = DecileLift.qDecileLift(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1L to 10L))

    val nDocs = 500L
    val nJunk = rows.map(_._3).sum
    assert(rows.map(_._2).sum == nDocs + nJunk, "every planted doc lands in exactly one decile")
    assert(nJunk == (0L until nDocs).count(_ % QualitySvm.JunkEvery == 0),
      "junk total equals the plant rule")
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1, "ntile cuts are equal ±1")

    // junk = 1/4 of the planted corpus with digit ratio ~3200bp vs ~0
    // natural: the top three deciles must capture ALL of it, and the
    // bottom decile none — a flat curve here means the score is noise
    assert(rows(2)._5 == 10000L, s"cum capture at decile 3 must be 100%: ${rows.mkString(", ")}")
    assert(rows(9)._4 == 0L, "bottom decile must be junk-free")
  }

  test("approx cut == exact ntile census at sf0.001 AND sf0.01 — the scale " +
    "path loses nothing at verify SF") {
    Seq(sf0001, sf001).foreach { sf =>
      val exact = DecileLift.qDecileLift(spark, sf).collect().toSeq
      val approx = DecileLift.qDecileLiftApprox(spark, sf).collect().toSeq
      assert(approx == exact,
        s"$sf: sketch-cut gains table must equal the exact ntile one\n" +
          s"exact=$exact\napprox=$approx")
    }
  }

  test("approx path plans with NO global sort on the corpus — cut points + " +
    "broadcast bucket join only") {
    val p = DecileLift.qDecileLiftApprox(spark, sf0001)
      .queryExecution.executedPlan.toString
    // the exact path's pinch is `Window.orderBy` = one rangepartitioning
    // exchange over every scored doc; the approx path must not have it
    // (the 10-row census orderBy(decile) is the only sort allowed)
    assert(!p.contains("rangepartitioning(k") && !p.contains("rangepartitioning(score_bp"),
      s"no total-order exchange over the scored corpus:\n$p")
    assert(!p.contains("ntile"),
      s"no windowed rank over the corpus — buckets come from broadcast cuts:\n$p")
  }

  test("total-order ntile makes the table partitioning-invariant") {
    val a = DecileLift.qDecileLift(spark, sf0001).collect().toSeq
    var b: Seq[org.apache.spark.sql.Row] = Nil
    withSQLConf("spark.sql.shuffle.partitions" -> "13") {
      b = DecileLift.qDecileLift(spark, sf0001).collect().toSeq
    }
    assert(a == b)
  }
}
