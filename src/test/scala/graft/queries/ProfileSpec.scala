package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {

  test("per-column report equals independently-computed single-column stats") {
    val out = Profile.qProfile(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out.keySet == Set("l_extendedprice", "l_quantity", "l_returnflag", "l_shipdate"))

    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val n = li.count()
    assert(out.values.forall(_._1 == n), "n_rows is the same single pass for every column")

    // independent per-column recomputation (separate aggregations)
    def one(c: org.apache.spark.sql.Column, name: String): Unit = {
      val r = li.agg(count(c).as("nn"), countDistinct(c).as("d"),
        min(c).as("mn"), max(c).as("mx")).collect()(0)
      val (nRows, nNull, nDist, mn, mx) = out(name)
      assert(nNull == n - r.getLong(0), s"$name null count")
      assert(nDist == r.getLong(1), s"$name distinct count")
      assert(mn == r.getLong(2) && mx == r.getLong(3), s"$name min/max")
    }
    one(when(col("l_orderkey") % 97 === 13, lit(null))
      .otherwise(col("l_quantity").cast("long")), "l_quantity")
    one(floor(col("l_extendedprice") * 100 + 0.5).cast("long"), "l_extendedprice")
    one(when(col("l_orderkey") % 89 === 7, lit(null))
      .otherwise(ascii(col("l_returnflag")).cast("long")), "l_returnflag")
    one(unix_micros(col("l_shipdate").cast("timestamp")), "l_shipdate")

    // the planted nulls are actually exercised
    assert(out("l_quantity")._2 > 0 && out("l_returnflag")._2 > 0,
      "planted null accounting must be non-zero")
    assert(out("l_extendedprice")._2 == 0 && out("l_shipdate")._2 == 0)
  }

  test("plan: ONE scan + Expand — not a join/union of per-column passes") {
    val p = Profile.qProfile(spark, sf0001).queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      s"profiling must read the table exactly once:\n$p")
    assert(p.contains("Expand"),
      s"the N exact distincts must ride one Expand rewrite:\n$p")
    assert(!p.contains("Join") && !p.contains("Union"),
      s"no per-column subplan join/union:\n$p")
  }
}
