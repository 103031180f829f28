package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TfRecordSinkSpec extends SparkSpec {

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(dir: String): Unit =
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(dir))

  test("streaming TFRecord sink is exactly-once: restart appends nothing, " +
    "a second feed wave appends only its own rows, and a replayed batch " +
    "id is a no-op (round-11 verdict #3)") {
    val feed = freshDir("graft-tfrsink-feed-")
    val out = freshDir("graft-tfrsink-out-")
    val ckpt = freshDir("graft-tfrsink-ckpt-")
    try {
      val records = TfRecordStream.records(spark, sf0001)
      val curated = records.filter(col("n_tokens") >= TfRecordSink.MinTokens)
      val wave1 = records.filter(col("doc_id") % 2 === 0)
      val wave2 = records.filter(col("doc_id") % 2 =!= 0)
      wave1.repartition(4).write.format("graft-tfrecord").mode("append").save(feed)

      TfRecordSink.runCurateToSink(spark, feed, out, ckpt)
      val files1 = TfRecordSink.committedFiles(out)
      assert(files1.nonEmpty, "wave 1 must publish shards")
      def sinkCount(): Long =
        TfRecordSink.readCommitted(spark, TfRecordStream.feedSchema, out).count()
      val n1 = sinkCount()
      assert(n1 == curated.filter(col("doc_id") % 2 === 0).count(),
        "wave 1 sink content must be exactly the curated even docs")

      // restart with NOTHING new: no new manifests, no new files
      TfRecordSink.runCurateToSink(spark, feed, out, ckpt)
      assert(TfRecordSink.committedFiles(out) == files1,
        "an idle restart must append nothing to the sink")
      assert(sinkCount() == n1)

      // wave 2: only the new files' curated rows append
      wave2.repartition(4).write.format("graft-tfrecord").mode("append").save(feed)
      TfRecordSink.runCurateToSink(spark, feed, out, ckpt)
      assert(sinkCount() == curated.count(),
        "after wave 2 the sink must hold exactly all curated docs — no replay, no loss")
      assert(TfRecordSink.committedFiles(out).take(files1.size) == files1,
        "wave 2 must not rewrite wave 1's committed shards")

      // replayed batch id (foreachBatch's re-delivery window): NO-OP
      val before = TfRecordSink.committedFiles(out)
      TfRecordSink.commitBatch(
        curated.limit(5), batchId = 0L, outDir = out)
      assert(TfRecordSink.committedFiles(out) == before && sinkCount() == curated.count(),
        "a replayed batch id must publish nothing")
    } finally { rm(feed); rm(out); rm(ckpt) }
  }

  test("manifest COMPACTION: after 12 batches the commit log is one " +
    "compact + <=2 deltas (never one file per historical batch), " +
    "committedFiles is unchanged across the compaction, and a replayed " +
    "COMPACTED batch id is still a no-op") {
    val out = freshDir("graft-tfrsink-cmp-")
    try {
      val records = TfRecordStream.records(spark, sf0001).limit(240)
      (0L until 12L).foreach { id =>
        TfRecordSink.commitBatch(
          records.filter(col("doc_id") % 12 === id).coalesce(1), id, out)
      }
      val files = TfRecordSink.committedFiles(out)
      assert(files.size == 12, s"12 batches -> 12 shards, got ${files.size}")
      val logNames = new java.io.File(out, "_graft_commits").listFiles()
        .map(_.getName).sorted.toSeq
      assert(logNames.count(_.endsWith(".compact")) == 1 &&
        logNames.count(_.forall(_.isDigit)) <= 2,
        s"compaction must bound the commit log, got $logNames")
      val total = TfRecordSink
        .readCommitted(spark, TfRecordStream.feedSchema, out).count()
      // replaying a batch id that only lives inside the compact: no-op
      TfRecordSink.commitBatch(records.limit(7), 3L, out)
      assert(TfRecordSink.committedFiles(out) == files &&
        TfRecordSink.readCommitted(spark, TfRecordStream.feedSchema, out)
          .count() == total,
        "a replayed compacted batch id must publish nothing")
    } finally rm(out)
  }

  test("unmanifested residue (a crashed attempt's files) is swept on retry " +
    "and never read back as data") {
    val out = freshDir("graft-tfrsink-res-")
    try {
      val records = TfRecordStream.records(spark, sf0001).limit(50)
      // batch 0 commits normally
      TfRecordSink.commitBatch(records, 0L, out)
      val committed = TfRecordSink.committedFiles(out)
      // a crashed attempt of batch 1: physical shards, no manifest
      records.limit(10).coalesce(1)
        .write.format("graft-tfrecord").mode("append").save(out)
      assert(TfRecordSink.readCommitted(spark, TfRecordStream.feedSchema, out)
        .count() == 50, "stray files must be invisible to the read-back")
      // the retry of batch 1 sweeps the residue, then publishes
      TfRecordSink.commitBatch(records.limit(10), 1L, out)
      assert(TfRecordSink.committedFiles(out).size > committed.size)
      assert(TfRecordSink.readCommitted(spark, TfRecordStream.feedSchema, out)
        .count() == 60, "retry must publish exactly once")
      // directory holds ONLY manifested data files after the sweep
      val listed = new java.io.File(out).listFiles()
        .map(_.getName).filter(n => n.endsWith(".tfrecord") || n.endsWith(".tfrecord.gz"))
      assert(listed.toSet == TfRecordSink.committedFiles(out).toSet,
        "the sweep must leave no unmanifested data files behind")
    } finally rm(out)
  }
}
