package graft.queries

import graft.SparkSpec

class RfmSpec extends SparkSpec {

  test("census covers every customer once, buckets stay in 1..4") {
    val rows = Rfm.qRfm(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val nCustomers = spark.read.parquet(s"$sf001/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(rows.map(_._4).sum == nCustomers, "every customer lands in exactly one segment")
    rows.foreach { case (r, f, m, n) =>
      assert(Seq(r, f, m).forall(b => b >= 1 && b <= 4))
      assert(n > 0)
    }
    // quartiles over a total order differ in size by at most one, so
    // each bucket's marginal is ~n/4 — pin the 1-bucket marginal exactly
    val rMarginal = rows.filter(_._1 == 1).map(_._4).sum
    assert(rMarginal == (nCustomers + 3) / 4,
      s"ntile(4) first-bucket marginal must be ceil(n/4): $rMarginal")
  }

  test("total-order ntile makes the census a pure function of the data (parallelism-proof)") {
    val a = Rfm.qRfm(spark, sf0001).collect().toSeq
    withSQLConf("spark.sql.shuffle.partitions" -> "3") {
      val b = Rfm.qRfm(spark, sf0001).collect().toSeq
      assert(a == b, "segment census must not depend on partitioning")
    }
  }
}
