package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

/** The webdataset instantiation of the shared FileSetMicroBatchStream
  * — admission control and restart exactly-once pins, mirroring
  * TfRecordStreamSpec (the machinery is one class; these pins prove
  * the SECOND format's wiring, not a re-derivation of the offsets
  * design).
  */
class WdsStreamSpec extends SparkSpec {

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(dir: String): Unit =
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(dir))

  private val feedSchema: StructType = StructType(
    StructField("__key__", StringType) +:
      TfRecordStream.feedSchema.fields.toSeq)

  private def keyed(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("__key__", format_string("%012d", col("doc_id")))

  test("bounded webdataset streaming census equals the batch census AND " +
    "arrives in multiple micro-batches (the shared admission control " +
    "drives the tar source too)") {
    val feed = freshDir("graft-wdss-spec-")
    try {
      val records = TfRecordStream.records(spark, sf0001)
      keyed(records).repartition(6)
        .write.format("graft-webdataset").mode("append").save(feed)
      val q = spark.readStream.format("graft-webdataset")
        .schema(feedSchema)
        .option("maxFilesPerTrigger", 2)
        .load(feed)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
        .writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName("wdss_census")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 3,
        s"6 shards at 2 files/trigger must take >=3 micro-batches, got $dataBatches")
      val got = spark.table("wdss_census").orderBy("lang")
      val expect = records.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
        .orderBy("lang")
      assert(got.collect().toSeq == expect.collect().toSeq,
        "streaming census must converge to the batch census")
    } finally rm(feed)
  }

  test("restart against the same checkpoint is exactly-once for tar " +
    "shards: the second run admits ONLY the files that arrived after " +
    "the first") {
    val feed = freshDir("graft-wdss-restart-")
    val ckpt = freshDir("graft-wdss-ckpt-")
    val out = freshDir("graft-wdss-out-")
    try {
      val records = TfRecordStream.records(spark, sf0001)
      val wave1 = keyed(records.filter(col("doc_id") % 2 === 0))
      val wave2 = keyed(records.filter(col("doc_id") % 2 =!= 0))
      wave1.repartition(2).write.format("graft-webdataset").mode("append").save(feed)
      def run(): Long = {
        val q = spark.readStream.format("graft-webdataset")
          .schema(feedSchema).load(feed)
          .writeStream.outputMode(OutputMode.Append())
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.read.parquet(out).count()
      }
      assert(run() == wave1.count(), "run 1 reads wave 1")
      wave2.repartition(2).write.format("graft-webdataset").mode("append").save(feed)
      assert(run() == wave1.count() + wave2.count(),
        "a restarted query must admit ONLY the new files — no replay, no loss")
    } finally { rm(feed); rm(ckpt); rm(out) }
  }
}
