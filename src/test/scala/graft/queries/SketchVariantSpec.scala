package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchVariantSpec extends SparkSpec {

  test("q_hll_sketch: every scope in-band, union row covers the global distinct") {
    val rows = Sketches.qHllSketch(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val types = spark.read.parquet(s"$sf001/events.parquet")
      .select("event_type").distinct().count()
    assert(rows.length == types + 1)
    assert(rows.forall(_._3), s"every estimate must sit within the 2% band: ${rows.mkString(",")}")
    val union = rows.find(_._1 == "__union").get
    val exact = spark.read.parquet(s"$sf001/events.parquet")
      .select(countDistinct("user_id")).collect()(0).getLong(0)
    assert(union._2 == exact)
    // the union row's exact count exceeds any single type's (overlap)
    assert(rows.filter(_._1 != "__union").forall(_._2 <= union._2))
  }

  test("q_bitmap_distinct: bitmap cardinalities equal exact distincts; dense guard fires") {
    val rows = Sketches.qBitmapDistinct(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(s"$sf001/events.parquet")
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactUnion = spark.read.parquet(s"$sf001/events.parquet")
      .select(countDistinct("user_id")).collect()(0).getLong(0)
    assert(rows == exact + ("__union" -> exactUnion))

    // dense-domain contract: an out-of-range id is a loud failure
    val e = intercept[org.apache.spark.SparkException] {
      Sketches.qBitmapDistinct(spark, sf001, maxId = 8).collect()
    }
    assert(e.getMessage.contains("dense domain") ||
      e.getCause != null && e.getCause.getMessage.contains("dense domain"))
  }

  test("q_variant_extract: shredded values reconcile with a direct column aggregation") {
    val got = VariantOps.qVariantExtract(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val direct = Analytics.loadEvents(spark, sf001)
      .select(col("event_type"), pmod(col("user_id"), lit(10)).as("seg"),
        get_json_object(col("props"), "$.k").cast("long").as("k"), col("value"))
      .groupBy("event_type", "seg")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), Analytics.moneySum(col("value")).as("sum_v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == direct)
    assert(got.nonEmpty && got.keySet.map(_._2).size == 10, "all 10 segments present")
  }

  test("variant shred is physical: the read path carries zero parse/variant expressions") {
    val path = VariantOps.writeShredded(spark, sf001)
    val read = spark.read.parquet(path)
    val plan = VariantOps.aggShredded(read).queryExecution.executedPlan.toString
    Seq("parse_json", "variant_get", "VariantExpressionEvalUtils", "VariantGet").foreach { m =>
      assert(!plan.contains(m),
        s"read path must aggregate typed columns only — found '$m':\n$plan")
    }
    // one shred row per event: the p traversals never re-shred or fan out
    val nEvents = Analytics.loadEvents(spark, sf001).count()
    assert(read.count() == nEvents, "exactly one shredded row per event")
    // the materialized round-trip loses nothing vs the in-memory shred
    val viaParquet = VariantOps.aggShredded(read).collect().map(_.toSeq).toSeq
    val inMemory = VariantOps.aggShredded(VariantOps.shredded(spark, sf001))
      .collect().map(_.toSeq).toSeq
    assert(viaParquet == inMemory)
  }
}
