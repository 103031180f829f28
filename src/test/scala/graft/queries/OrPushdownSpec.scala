package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OrPushdownSpec extends SparkSpec {

  private def centsOf(x: Double): Long = math.floor(x * 100 + 0.5).toLong

  test("per-brand rollup equals the driver-side brute replay") {
    val out = OrPushdown.qOrPushdown(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val parts = spark.read.parquet(s"$sf0001/part.parquet")
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val rows = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount").collect()
      .flatMap { r =>
        val (brand, size) = parts(r.getLong(0))
        val q = r.getDouble(1)
        val keep =
          (brand == "Brand#12" && size >= 1 && size <= 15 && q >= 1 && q <= 15) ||
          (brand == "Brand#23" && size >= 10 && size <= 30 && q >= 10 && q <= 25) ||
          (brand == "Brand#5" && size >= 20 && size <= 50 && q >= 25 && q <= 50)
        if (keep) Some(brand -> (centsOf(r.getDouble(2)) * (100L - centsOf(r.getDouble(3)))))
        else None
      }
    val expected = rows.groupBy(_._1).map { case (b, rs) =>
      val s = rs.map(_._2).sum
      b -> (rs.length.toLong, ((s + 50) / 100) / 100.0)
    }
    assert(out == expected, "per-brand census must equal the replay")
    assert(out.size == 3 && out.values.forall(_._1 > 0),
      "every disjunct must have a non-empty footprint")
  }

  test("plan: per-side OR extraction pushed into BOTH scans, residual kept on the join") {
    val p = OrPushdown.qOrPushdown(spark, sf0001).queryExecution.executedPlan.toString
    // lineitem scan: the quantity disjunction reached the parquet reader
    assert(p.contains("PushedFilters: [IsNotNull(l_partkey), Or(Or(And(GreaterThanOrEqual(l_quantity"),
      s"lineitem scan must carry the extracted quantity OR:\n$p")
    // part scan: the brand∧size disjunction reached the parquet reader
    assert(p.contains("PushedFilters: [IsNotNull(p_partkey), Or(Or(And(EqualTo(p_brand,Brand#12)"),
      s"part scan must carry the extracted brand/size OR:\n$p")
    // the cross-side original survives ON the join (extraction is
    // necessary, not sufficient)
    val joinLine = p.linesIterator.find(l => l.contains("Join") && l.contains("p_brand"))
    assert(joinLine.exists(l => l.contains("l_quantity")),
      s"the join must keep the full cross-side residual:\n$p")
  }
}
