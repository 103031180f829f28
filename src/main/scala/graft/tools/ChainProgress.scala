package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Per-trigger duration breakdown of the ChainedState replay shape
  * (round-15, guide §1): replicates ChainedState.drive for the bitmap
  * fold and prints each micro-batch's durationMs map (addBatch = the
  * fold job, walCommit/latestOffset/getBatch = stream machinery), so
  * the family optimization targets the real cost.
  */
object ChainProgress {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val maxId = 1 << 20
    for (rnd <- 1 to 2) {
      val feed = graft.queries.Analytics.loadEvents(spark, sfDir)
        .select("event_type", "user_id")
      val init = spark.range(0).select(col("id").cast("string").as("event_type"),
        lit(Array.emptyByteArray).as("bm"))
      val merge: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame =
        (st, batch) => st
          .unionByName(batch.groupBy("event_type")
            .agg(graft.functions.GraftFunctions.bitmap_build(col("user_id"), maxId).as("bm")))
          .groupBy("event_type")
          .agg(graft.functions.GraftFunctions.bitmap_or(col("bm")).as("bm"))
      val base = java.nio.file.Files.createTempDirectory("graft-chainprog-")
      val t0 = System.nanoTime()
      feed.repartition(8).write.mode("overwrite").parquet(base.resolve("feed").toString)
      init.write.mode("overwrite").parquet(base.resolve("state").toString + "/state-init")
      val tFeed = System.nanoTime()
      val feedDir = base.resolve("feed").toString
      graft.streaming.FileStreams.withBoundedStreamPartitions(spark, feedDir) {
        val stateRoot = base.resolve("state").toString
        val statePath = new java.util.concurrent.atomic.AtomicReference[String](s"$stateRoot/state-init")
        val stateSchema = spark.read.parquet(statePath.get).schema
        var lastEnd = System.nanoTime()
        val folds = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
        val q = spark.readStream
          .schema(spark.read.parquet(feedDir).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(feedDir)
          .writeStream
          .option("checkpointLocation", base.resolve("ckpt").toString)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            val s = System.nanoTime()
            graft.streaming.ChainedState.foldBatch(spark, stateRoot, statePath, merge,
              batch.toDF(), id, stateSchema)
            val e = System.nanoTime()
            folds += ((id, (s - lastEnd) / 1e9, (e - s) / 1e9))
            lastEnd = e
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val t1 = System.nanoTime()
        println(f"CHAINPROG ---- round $rnd feed=${(tFeed - t0) / 1e9}%.2f stream=${(t1 - tFeed) / 1e9}%.2f")
        folds.foreach { case (id, gap, fold) =>
          println(f"CHAINPROG batch $id gap=$gap%.3f fold=$fold%.3f")
        }
        q.recentProgress.foreach { p =>
          val d = p.durationMs
          println(s"CHAINPROG durations batch=${p.batchId} " +
            Seq("latestOffset", "getBatch", "queryPlanning", "addBatch", "walCommit", "commitOffsets", "triggerExecution")
              .map(k => s"$k=${Option(d.get(k)).getOrElse("-")}").mkString(" "))
        }
      }
    }
    spark.stop()
  }
}
