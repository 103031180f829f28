package graft.streaming

import graft.SparkSpec
import graft.queries.{Analytics, Funnel}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class StreamFunnelSpec extends SparkSpec {

  test("funnel state machine re-bases on late-arriving earlier events (reverse chunks)") {
    // Adversarial arrival: three chunk files in REVERSE event-time
    // order, one per micro-batch. Every user's earliest signup arrives
    // LAST, so a fold that froze t1 at first sight would qualify the
    // wrong views — only the re-deriving state machine converges to
    // the batch chain.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // normalized ts (micros TIMESTAMP) so chunk files carry the engine's
    // event-time type whatever the physical type underneath
    val ev = Analytics.normalizeTs(spark.read.parquet(s"$sf0001/events.parquet")).orderBy("ts")
    val n = ev.count()
    val rows = ev.collect()
    val cuts = Seq(rows((n / 3).toInt).getAs[java.sql.Timestamp]("ts"),
      rows((2 * n / 3).toInt).getAs[java.sql.Timestamp]("ts"))
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel-chunks-")
    Seq(
      ev.filter(col("ts") >= cuts(1)),                          // latest third first
      ev.filter(col("ts") >= cuts(0) && col("ts") < cuts(1)),
      ev.filter(col("ts") < cuts(0))                            // earliest third last
    ).zipWithIndex.foreach { case (chunk, i) =>
      chunk.coalesce(1).write.parquet(s"$dir/c$i")
      val f = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/c$i"))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.createSymbolicLink(dir.resolve(f"chunk_$i%02d.parquet"), f)
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
      .withColumn("te", unix_micros(col("ts")))
    val q = EventStream.funnelState(stream)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("spec_funnel_chunked")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) > 1,
      "chunked arrival must produce multiple non-empty micro-batches")
    val streamed = spark.table("spec_funnel_chunked")
      .groupBy("user_id")
      .agg(max(struct(col("n_seen"), col("t1"), col("t2"), col("t3"))).as("f"))
      .agg(
        count(lit(1)).as("n_users"),
        count(when(col("f.t1") =!= -1L, 1)).as("u_signup"),
        count(when(col("f.t2") =!= -1L, 1)).as("u_view"),
        count(when(col("f.t3") =!= -1L, 1)).as("u_purchase"),
        min(when(col("f.t1") =!= -1L, col("f.t1"))).as("first_signup_us"),
        max(when(col("f.t3") =!= -1L, col("f.t3"))).as("last_purchase_us"))
      .collect()(0)
    val batch = Funnel.qFunnel(spark, sf0001).collect()(0)
    assert(streamed == batch,
      s"reverse-chunked stream must converge to the batch funnel: $streamed vs $batch")
  }

  test("bounded streaming funnel equals the batch funnel row") {
    val streamed = EventStream.runFunnelBounded(spark, sf0001,
      queryName = "spec_funnel_bounded").collect()(0)
    val batch = Funnel.qFunnel(spark, sf0001).collect()(0)
    assert(streamed == batch, s"$streamed vs $batch")
  }
}
