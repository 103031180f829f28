package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PhashNearSpec extends SparkSpec {

  test("banded join surfaces every planted twin at its exact hamming distance") {
    val rows = PhashNear.phashNearRecall(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.map(_._1).toSeq == Seq("flip1", "flip3"))
    val nOk = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") % 13 =!= 0).count()
    rows.foreach { case (tier, planted, found, ok) =>
      assert(planted == nOk, s"$tier planted census")
      assert(found == planted, s"$tier must find every twin (pigeonhole completeness)")
      assert(ok)
    }
    assert(nOk > 0)
  }

  test("bucket guard fails loudly on a degenerate cap") {
    val e = intercept[IllegalArgumentException] {
      PhashNear.phashNearRecall(spark, sf0001, maxBucket = 1)
    }
    assert(e.getMessage.contains("band bucket"))
  }
}
