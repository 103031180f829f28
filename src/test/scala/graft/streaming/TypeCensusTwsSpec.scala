package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Map-state-leg pins: the bounded census equals the batch two-key
  * aggregate, AvailableNow actually TERMINATES under TimeMode.None
  * (the documented contrast with the TTL/timer rows), and counters
  * accumulate across micro-batches (map entries are persistent state,
  * not per-batch scratch).
  */
class TypeCensusTwsSpec extends SparkSpec {

  test("bounded run terminates under AvailableNow and equals the batch " +
    "per-(user, type) census") {
    val got = TypeCensusTws.runBounded(spark, sf0001, "typecensus_parity").collect()
    val expect = graft.queries.Analytics.loadEvents(spark, sf0001)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .orderBy("user_id", "event_type").collect()
    assert(got.map(_.toSeq).toSeq == expect.map(_.toSeq).toSeq,
      s"map-state census drifted (${got.length} vs ${expect.length} rows)")
  }

  test("map entries accumulate across micro-batches: a two-batch feed " +
    "converges to the same census as one batch") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = java.nio.file.Files.createTempDirectory("graft-typecensus-").toString
    val feedDir = s"$base/feed"
    val events = graft.queries.Analytics.loadEvents(spark, sf0001)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts"))
    events.filter(col("ts") % 2 === 0).repartition(1)
      .write.mode("overwrite").parquet(feedDir)
    events.filter(col("ts") % 2 === 1).repartition(1)
      .write.mode("append").parquet(feedDir)
    val schema = spark.read.parquet(feedDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(feedDir)
    UserStatsTws.withRocksDb(spark) {
      val q = TypeCensusTws.typeCensus(stream)
        .writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("typecensus_twobatch")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val got = spark.table("typecensus_twobatch")
      .groupBy("user_id", "event_type").agg(max(col("n")).as("n"))
      .orderBy("user_id", "event_type").collect()
    val expect = events.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("user_id", "event_type").collect()
    assert(got.map(_.toSeq).toSeq == expect.map(_.toSeq).toSeq,
      "per-type counters must CONTINUE across batches — a reset map " +
        "undercounts every (user, type) seen in both halves")
  }
}
