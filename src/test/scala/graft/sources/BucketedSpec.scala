package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle exchange") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf0001/lineitem.parquet")
    Bucketed.writeBucketed(orders, "orders_b", "o_orderkey", 8)
    Bucketed.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", 8)

    // disable broadcast so the join strategy must be sort-merge — the
    // case bucketing accelerates; with co-located buckets there is no
    // Exchange on either side.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.table(spark, "orders_b")
        .join(Bucketed.table(spark, "lineitem_b"), "o_orderkey")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(joined.collect().nonEmpty)
      val bucketedJoin = Bucketed.table(spark, "orders_b")
        .join(Bucketed.table(spark, "lineitem_b"), "o_orderkey")
      assert(Bucketed.isShuffleFree(bucketedJoin),
        s"bucketed join must not exchange:\n${bucketedJoin.queryExecution.executedPlan}")
      // sanity: the same join over raw parquet DOES shuffle
      val rawJoin = orders
        .join(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      assert(!Bucketed.isShuffleFree(rawJoin), "raw join should shuffle")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
