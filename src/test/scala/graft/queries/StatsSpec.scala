package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {

  test("q_mode picks the most frequent quantity with smaller-value ties") {
    val counts = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val expected = counts.groupBy(_._1._1).map { case (flag, m) =>
      val best = m.toSeq.map { case ((_, q), c) => (q, c) }
        .sortBy { case (q, c) => (-c, q) }.head
      flag -> best
    }
    val got = Stats.qMode(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got == expected)
  }


  test("moment aggregates are well-formed and cover every row") {
    val rows = Stats.qStatsMoments(spark, sf001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    val n = spark.read.parquet(s"$sf001/lineitem.parquet").count()
    assert(total == n, s"group sizes must partition the table: $total != $n")
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(3) > 0, "spreads must be positive")
      val c = r.getDouble(5)
      assert(c >= -1.0 && c <= 1.0, s"correlation $c out of [-1, 1]")
    }
  }

  test("ntile quartiles are balanced and ordered by price") {
    val q = Stats.qNtile(spark, sf001).collect()
    assert(q.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    // ntile balance: per customer the four buckets differ by <= 1 row,
    // so globally |n_q - n/4| <= customers-with-orders.
    val counts = q.map(_.getLong(1))
    val nCustomers = spark.read.parquet(s"$sf001/orders.parquet")
      .select("o_custkey").distinct().count()
    val per = counts.sum / 4.0
    counts.foreach { c =>
      assert(math.abs(c - per) <= nCustomers,
        s"quartile size $c too far from balanced $per for $nCustomers customers")
    }
    // Quartiles sort ascending by construction → avg prices ascend.
    val avgs = q.map(_.getDouble(3))
    assert(avgs.sliding(2).forall(p => p(0) <= p(1)),
      s"quartile averages must ascend: ${avgs.mkString(", ")}")
  }
}
