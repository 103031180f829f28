package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CustDistSpec extends SparkSpec {

  test("distribution equals the driver replay; zero-order customers survive") {
    val out = CustDist.qCustdist(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0))
    val ordCounts = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter(col("o_orderpriority").like("%URGENT%"))
      .select("o_custkey").collect().map(_.getLong(0))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val expected = cust.map(c => ordCounts.getOrElse(c, 0L))
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      .toSeq.sortBy { case (c, d) => (-d, -c) }

    assert(out.toSeq == expected, "bucket census must equal the replay")
    assert(out.exists(_._1 == 0L),
      "the zero bucket must survive the preserved outer join (the WHERE rewrite drops it)")
    assert(out.map(_._2).sum == cust.length,
      "every customer lands in exactly one bucket")
  }

  test("plan: the per-customer count rides the join exchange (3 hash exchanges)") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val p = CustDist.qCustdist(spark, sf0001).queryExecution.executedPlan.toString
      val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(hashExchanges == 3,
        s"expected two join-side exchanges + the bucket rollup only, got $hashExchanges:\n$p")
    }
  }
}
