package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HhiSpec extends SparkSpec {

  private def centsOf(x: Double): Long = math.floor(x * 100 + 0.5).toLong

  test("per-nation HHI equals the exact BigInt replay; bounds hold") {
    val out = Hhi.qHhi(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    val supNation = spark.read.parquet(s"$sf0001/supplier.parquet")
      .join(spark.read.parquet(s"$sf0001/nation.parquet"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perSupplier = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_suppkey", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getLong(0),
        centsOf(r.getDouble(1)) * (100L - centsOf(r.getDouble(2)))))
      .groupBy(_._1).map { case (s, rs) => (supNation(s), s) -> rs.map(r => BigInt(r._2)).sum }

    val expected = perSupplier.groupBy(_._1._1).map { case (nation, m) =>
      val rs = m.values.toSeq
      val rev = rs.sum
      val hhi = (BigInt(10000) * rs.map(r => r * r).sum) / (rev * rev)
      nation -> (m.size.toLong, (rev / 10000).toLong, hhi.toLong)
    }
    assert(out == expected, "HHI must equal the exact BigInt replay")
    out.foreach { case (nation, (n, _, hhi)) =>
      assert(hhi >= 10000L / n - 1 && hhi <= 10000L,
        s"$nation HHI must sit in [1/n, 1] basis points")
    }
  }

  test("plan: broadcast dims + two-level aggregation, no window/self-join") {
    val p = Hhi.qHhi(spark, sf0001).queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2,
      s"both dims must broadcast:\n$p")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"),
      s"HHI is pure two-level aggregation:\n$p")
  }
}
