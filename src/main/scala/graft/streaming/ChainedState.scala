package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Shared scaffold for the bounded chained-state streams
  * ([[RateSpikeStream]], [[BitmapStream]]; [[MergeStream]] is the same
  * shape): write a feed as N files, replay it one file per
  * micro-batch, and fold each batch into a keyed state snapshot via
  * `foreachBatch` — state-k is merge(state-(k-1), batch-k), each state
  * a fresh parquet dir under a per-run temp root. Cross-batch carry is
  * the load-bearing part every caller's spec pins (a chain of ≥ N
  * state dirs), and the AtomicReference makes the micro-batch-thread →
  * caller-thread hand-off of the final path explicit.
  */
object ChainedState {

  // One static hook draining every run's root: per-run addShutdownHook
  // calls would accumulate hook threads without bound across repeated
  // bench/test runs in one JVM.
  private val tempRoots = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  private lazy val hookOnce: Unit = {
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      tempRoots.forEach(p => rm(p.toFile))
    }
    ()
  }

  /** Runs the bounded replay; returns (final state DataFrame, state
    * root — for spec chain assertions).
    */
  def run(spark: SparkSession, tag: String, feed: DataFrame, feedFiles: Int,
          initState: DataFrame,
          merge: (DataFrame, DataFrame) => DataFrame): (DataFrame, String) = {
    val base = java.nio.file.Files.createTempDirectory(s"graft-$tag-")
    // the root (full feed copy + every chained snapshot) lives until
    // JVM exit — long enough for spec chain assertions, bounded across
    // repeated fork-per-query bench runs
    hookOnce
    tempRoots.add(base)
    val feedDir = base.resolve("feed").toString
    val stateRoot = base.resolve("state").toString
    feed.repartition(feedFiles).write.mode("overwrite").parquet(feedDir)

    val statePath = new java.util.concurrent.atomic.AtomicReference[String](
      s"$stateRoot/state-init")
    initState.write.mode("overwrite").parquet(statePath.get)

    val q = spark.readStream
      .schema(spark.read.parquet(feedDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val merged = merge(spark.read.parquet(statePath.get), batch.toDF())
        val next = s"$stateRoot/state-$id"
        merged.write.mode("overwrite").parquet(next)
        statePath.set(next)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (spark.read.parquet(statePath.get), stateRoot)
  }
}
