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
  *
  * Replay idempotence (the foreachBatch retry contract): Spark may
  * re-deliver a micro-batch id after a failure — the classic case is a
  * crash AFTER the state write committed but BEFORE the offset log
  * advanced. [[foldBatch]] therefore gates on the batch id: when
  * `state-$id` already exists COMMITTED (its `_SUCCESS` marker is the
  * write's atomic commit record), the merge is skipped entirely and
  * only the pointer advances — an ADDITIVE fold (RateSpikeStream's
  * counts) would otherwise double-count the replayed batch. A partial
  * dir without `_SUCCESS` (crash mid-write) is NOT treated as done;
  * the overwrite-mode rewrite replaces it. The replayed-batch spec
  * (ChainedStateSpec) pins both branches.
  *
  * Restart recovery: `resume(spark, base, merge)` re-enters a prior
  * run's root whose feed dir gained new files (append them BEFORE
  * calling — resume deliberately takes no feed/initState and writes
  * nothing). The checkpoint under the root makes the file source skip
  * already-committed batches, and the state pointer re-seeds from the
  * highest committed `state-<id>` dir, so the fold continues from the
  * carried state instead of re-folding from init (the restart specs
  * pin final state == batch).
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

  /** True iff the state dir for this batch id was COMMITTED by a
    * previous attempt: parquet's `_SUCCESS` marker is written last, so
    * its presence is the commit record — a crash mid-write leaves a
    * partial dir without it, which must be (over)written, not skipped.
    */
  private[streaming] def committed(stateDir: String): Boolean =
    new java.io.File(stateDir, "_SUCCESS").isFile

  /** Fold ONE micro-batch into the chained state — idempotent under
    * batch-id replay (skips the merge when `state-$id` is already
    * committed). Package-visible so the replay spec can drive it
    * directly with a repeated id.
    */
  private[graft] def foldBatch(spark: SparkSession, stateRoot: String,
      statePath: java.util.concurrent.atomic.AtomicReference[String],
      merge: (DataFrame, DataFrame) => DataFrame,
      batch: DataFrame, id: Long,
      stateSchema: org.apache.spark.sql.types.StructType = null): Unit = {
    val next = s"$stateRoot/state-$id"
    if (!committed(next)) {
      // explicit schema when the caller has it (the drive loop reads it
      // once before the stream starts): per-fold footer-based schema
      // inference is pure fixed driver cost repeated every micro-batch
      val prev =
        if (stateSchema == null) spark.read.parquet(statePath.get)
        else spark.read.schema(stateSchema).parquet(statePath.get)
      val merged = merge(prev, batch)
      // Output sizing (guide §6): the merged state inherits the shuffle
      // partition count, but its FILE count should follow its BYTES —
      // a few-KB snapshot as 1 file, a large one at ~32 MB per file
      // (derived from the previous snapshot's size, the only bytes
      // measurable before the write), never more files than partitions.
      val target = (FileStreams.pathBytes(statePath.get) / (32L << 20) + 1).toInt
      merged.coalesce(math.max(1, target)).write.mode("overwrite").parquet(next)
    }
    statePath.set(next)
  }

  /** Highest committed `state-<id>` dir under the root, if any — the
    * resume point after a restart. `state-init` is the fallback.
    */
  private def lastCommittedState(stateRoot: String): Option[String] = {
    val re = "state-(\\d+)".r
    Option(new java.io.File(stateRoot).listFiles()).toSeq.flatten
      .flatMap(f => f.getName match {
        case re(id) if committed(f.getPath) => Some((id.toLong, f.getPath))
        case _ => None
      })
      .sortBy(_._1).lastOption.map(_._2)
  }

  /** Runs the bounded replay from a FRESH root; returns (final state
    * DataFrame, state root — for spec chain assertions).
    */
  def run(spark: SparkSession, tag: String, feed: DataFrame, feedFiles: Int,
          initState: DataFrame,
          merge: (DataFrame, DataFrame) => DataFrame): (DataFrame, String) = {
    val base = {
      val b = java.nio.file.Files.createTempDirectory(s"graft-$tag-")
      // the root (full feed copy + every chained snapshot) lives until
      // JVM exit — long enough for spec chain assertions, bounded across
      // repeated fork-per-query bench runs
      hookOnce
      tempRoots.add(b)
      b
    }
    feed.repartition(feedFiles).write.mode("overwrite")
      .parquet(base.resolve("feed").toString)
    initState.write.mode("overwrite")
      .parquet(base.resolve("state").toString + "/state-init")
    drive(spark, base, merge)
  }

  /** Resume a PREVIOUS run's base dir (the state root's parent): its
    * checkpoint decides which of `<base>/feed`'s files are new, and
    * carried state continues from the last committed snapshot. This
    * entry point takes NO feed/initState on purpose — a resume
    * (re)writes nothing; append the new feed files to `<base>/feed`
    * BEFORE calling, or the resume processes nothing and returns the
    * carried state unchanged.
    */
  def resume(spark: SparkSession, base: String,
             merge: (DataFrame, DataFrame) => DataFrame): (DataFrame, String) =
    drive(spark, java.nio.file.Paths.get(base), merge)

  private def drive(spark: SparkSession, base: java.nio.file.Path,
                    merge: (DataFrame, DataFrame) => DataFrame): (DataFrame, String) = {
    val feedDir = base.resolve("feed").toString
    FileStreams.withBoundedStreamPartitions(spark, feedDir) {
    val stateRoot = base.resolve("state").toString
    val ckptDir = base.resolve("ckpt").toString
    val statePath = new java.util.concurrent.atomic.AtomicReference[String](
      lastCommittedState(stateRoot).getOrElse(s"$stateRoot/state-init"))
    // state schema read ONCE here — every fold would otherwise re-infer
    // it from parquet footers (fixed driver cost per micro-batch)
    val stateSchema = spark.read.parquet(statePath.get).schema

    val q = spark.readStream
      .schema(spark.read.parquet(feedDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feedDir)
      .writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        foldBatch(spark, stateRoot, statePath, merge, batch.toDF(), id, stateSchema)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (spark.read.parquet(statePath.get), stateRoot)
    }
  }
}
