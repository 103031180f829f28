package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvolutionSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-evo-$tag").resolve("t").toString

  test("mergeSchema unifies generations; gen-1 rows null-fill the added column") {
    val path = tmp("merge")
    val (n1, n2) = Evolution.writeEvolved(spark, sf0001, path)
    val merged = Evolution.readMerged(spark, path)
    assert(merged.columns.toSet == Set("o_orderkey", "month", "total", "priority"))
    assert(merged.count() == n1 + n2)
    // exactly the gen-1 rows carry null priority, and they are the even keys
    val nulls = merged.filter(col("priority").isNull)
    assert(nulls.count() == n1)
    assert(nulls.filter(col("o_orderkey") % 2 =!= 0).count() == 0)
    // column pruning still applies to the merged scan
    val plan = merged.select("o_orderkey").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint>"),
      "merged-schema read must still prune to the selected column")
  }

  test("dynamic partition overwrite restates one month, others survive untouched") {
    val path = tmp("dynamic")
    Evolution.dynamicRestate(spark, sf0001, path, restateMonth = 3)
    val after = spark.read.parquet(path)
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), (col("o_orderkey") % 12).as("month"),
        col("o_totalprice").as("total"))
    // restated month: doubled totals, same keys
    val m3 = after.filter(col("month") === 3)
      .select("o_orderkey", "total").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val m3exp = orders.filter(col("month") === 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(2) * 2).toMap
    assert(m3 == m3exp, "restated partition must carry the new values")
    // every other partition byte-identical to the original write
    val others = after.filter(col("month") =!= 3)
      .select("o_orderkey", "total").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val othersExp = orders.filter(col("month") =!= 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(others == othersExp, "untouched partitions must survive a dynamic overwrite")
  }
}
