package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BagSetOpsSpec extends SparkSpec {

  test("multiset censuses equal the driver-side bag arithmetic") {
    val out = BagSetOps.qExceptAll(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderstatus", "o_custkey").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def bag(st: String) = o.filter(_._1 == st).map(_._2)
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val (ma, mb) = (bag("O"), bag("F"))
    def census(m: Map[Long, Long]) = {
      val kept = m.filter(_._2 > 0)
      (kept.values.sum, kept.size.toLong, kept.map { case (k, c) => k * c }.sum)
    }
    val ex = census((ma.keySet ++ mb.keySet).map(k =>
      k -> math.max(ma.getOrElse(k, 0L) - mb.getOrElse(k, 0L), 0L)).toMap)
    val ia = census((ma.keySet ++ mb.keySet).map(k =>
      k -> math.min(ma.getOrElse(k, 0L), mb.getOrElse(k, 0L))).toMap)
    assert(out("except_all") == ex, "EXCEPT ALL bag census")
    assert(out("intersect_all") == ia, "INTERSECT ALL bag census")
    // multiplicity matters: both results non-trivial and different from
    // the set-semantics answer (distinct customers < rows in the bag)
    assert(ex._1 > ex._2 && ia._1 > ia._2,
      "bag semantics must be visible (some customer keeps multiplicity > 1)")
  }

  test("plan: count-tag + Generate rewrite, never a join of the branches") {
    val p = BagSetOps.qExceptAll(spark, sf0001).queryExecution.executedPlan.toString
    assert(p.contains("Generate"),
      s"ALL variants must replicate via Generate over merged counts:\n$p")
    assert(!p.contains("Join"),
      s"no join of the two branches:\n$p")
  }
}
