package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class TfRecordStreamSpec extends SparkSpec {

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(dir: String): Unit =
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(dir))

  test("bounded streaming census equals the batch census AND arrives in " +
    "multiple micro-batches (admission control is real, not one big batch)") {
    val feed = freshDir("graft-tfrs-spec-")
    try {
      val records = TfRecordStream.records(spark, sf0001)
      records.repartition(6)
        .write.format("graft-tfrecord").mode("append").save(feed)
      val q = spark.readStream.format("graft-tfrecord")
        .schema(TfRecordStream.feedSchema)
        .option("maxFilesPerTrigger", 2)
        .load(feed)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
        .writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName("tfrs_census")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 3,
        s"6 shards at 2 files/trigger must take >=3 micro-batches, got $dataBatches")
      val got = spark.table("tfrs_census").orderBy("lang")
      val expect = records.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
        .orderBy("lang")
      assert(got.collect().toSeq == expect.collect().toSeq,
        "streaming census must converge to the batch census")
    } finally rm(feed)
  }

  test("restart against the same checkpoint is exactly-once: the second " +
    "run processes ONLY the files that arrived after the first") {
    val feed = freshDir("graft-tfrs-restart-")
    val ckpt = freshDir("graft-tfrs-ckpt-")
    val out = freshDir("graft-tfrs-out-")
    try {
      val records = TfRecordStream.records(spark, sf0001)
      val wave1 = records.filter(col("doc_id") % 2 === 0)
      val wave2 = records.filter(col("doc_id") % 2 =!= 0)
      wave1.repartition(2).write.format("graft-tfrecord").mode("append").save(feed)
      // the memory sink cannot recover a checkpoint — the restart pin
      // needs a fault-tolerant sink (parquet), like DocStream's
      def run(): Long = {
        val q = spark.readStream.format("graft-tfrecord")
          .schema(TfRecordStream.feedSchema).load(feed)
          .writeStream.outputMode(OutputMode.Append())
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.read.parquet(out).count()
      }
      assert(run() == wave1.count(), "run 1 reads wave 1")
      wave2.repartition(2).write.format("graft-tfrecord").mode("append").save(feed)
      assert(run() == wave1.count() + wave2.count(),
        "a restarted query must admit ONLY the new files — no replay, no loss")
    } finally { rm(feed); rm(ckpt); rm(out) }
  }

  test("staged .inprogress files are never admitted by the stream") {
    val feed = freshDir("graft-tfrs-stage-")
    try {
      val records = TfRecordStream.records(spark, sf0001).limit(100)
      records.coalesce(1).write.format("graft-tfrecord").mode("append").save(feed)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(feed, "part-00099-dead-1.tfrecord.inprogress"),
        Array[Byte](1, 2, 3))
      val q = spark.readStream.format("graft-tfrecord")
        .schema(TfRecordStream.feedSchema).load(feed)
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("tfrs_stage")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      assert(spark.table("tfrs_stage").count() == 100,
        "a staged half-written file must be invisible to the stream")
    } finally rm(feed)
  }

  test("offset json round-trips the file-name set") {
    val o = graft.sources.FileSetStreamOffset(Seq("b.tfrecord", "a.tfrecord.gz"))
    val back = graft.sources.FileSetStreamOffset.fromJson(o.json())
    assert(back.files == o.files)
  }

  test("offset COMPACTION past the threshold: the offsets log carries an " +
    "O(1) content-addressed ref, and restart recovery resolves it " +
    "exactly-once (the 100 TB offset path)") {
    val feed = freshDir("graft-tfrs-compact-")
    val ckpt = freshDir("graft-tfrs-cckpt-")
    val out = freshDir("graft-tfrs-cout-")
    try {
      val records = TfRecordStream.records(spark, sf0001).limit(600)
      // 8 shards with threshold 4 → compaction engages mid-run
      records.repartition(8).write.format("graft-tfrecord").mode("append").save(feed)
      def run(): Long = {
        val q = spark.readStream.format("graft-tfrecord")
          .schema(TfRecordStream.feedSchema)
          .option("maxFilesPerTrigger", 2)
          .option("offsetCompactionThreshold", 4)
          .load(feed)
          .writeStream.outputMode(OutputMode.Append())
          .format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.read.parquet(out).count()
      }
      assert(run() == records.count())
      // the final committed offset in the checkpoint log must be the
      // compact ref form, with the name list persisted alongside
      val offsetsDir = new java.io.File(ckpt, "offsets")
      val last = offsetsDir.listFiles().filter(_.getName.forall(_.isDigit))
        .maxBy(_.getName.toInt)
      val text = new String(java.nio.file.Files.readAllBytes(last.toPath), "UTF-8")
      assert(text.contains("\"compact\""),
        s"final offset must serialize as a compact ref, got: $text")
      // Spark hands the source a per-source checkpoint subdir — locate
      // the persisted seen-set wherever it landed under the root
      def snapshots(): Seq[java.nio.file.Path] = {
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.filter(p =>
            p.getFileName.toString.endsWith(".txt") &&
              Option(p.getParent).exists(_.getFileName.toString == "graft-tfrecord-seen"))
            .toSeq
        } finally walk.close()
      }
      assert(snapshots().nonEmpty, "persisted seen-set missing under the checkpoint")
      // GC pin: commit() prunes superseded snapshots to a bounded set
      // (newest-4 mtime window + the 8-ref reachability ring) — not
      // one file per trigger forever
      assert(snapshots().size <= 12,
        s"superseded snapshots must be pruned at commit, got ${snapshots()}")
      // restart with 4 more shards: only the new files are admitted,
      // resolved THROUGH the compact ref
      val more = TfRecordStream.records(spark, sf0001)
        .orderBy(col("doc_id").desc).limit(300)
      more.repartition(4).write.format("graft-tfrecord").mode("append").save(feed)
      assert(run() == records.count() + more.count(),
        "restart must resolve the compact offset and admit only new files")
    } finally { rm(feed); rm(ckpt); rm(out) }
  }

  test("seen-set GC retains by REACHABILITY, not mtime: a snapshot the " +
    "offsets log still references survives commit-time pruning even " +
    "backdated to the epoch (round-11 advice: an mtime tie or extra " +
    "persist must not make the checkpoint unrestartable)") {
    val ckpt = freshDir("graft-tfrs-gc-")
    try {
      val seen = java.nio.file.Paths.get(ckpt, "graft-tfrecord-seen")
      java.nio.file.Files.createDirectories(seen)
      // 7 snapshots, staggered mtimes; ref0 is the OLDEST — and the one
      // the offsets log (simulated by deserializeOffset below) names
      val refs = (0 to 6).map(i => f"ref$i%02x" * 8) // 32-char names
      refs.zipWithIndex.foreach { case (r, i) =>
        val p = seen.resolve(s"$r.txt")
        java.nio.file.Files.write(p, s"file-$r.tfrecord".getBytes("UTF-8"))
        p.toFile.setLastModified(if (i == 0) 1000L else 1700000000000L + i * 2000L)
      }
      val stream = new graft.sources.TfRecordMicroBatchStream(
        TfRecordStream.feedSchema, ckpt /* unused as a feed here */,
        None, ckpt, 4)
      // restart path: populateStartOffsets resolves the logged ref —
      // this REGISTERS it as reachable
      val resolved = stream.deserializeOffset(s"""{"compact":"${refs.head}","n":1}""")
      assert(resolved.asInstanceOf[graft.sources.FileSetStreamOffset]
        .files == Seq(s"file-${refs.head}.tfrecord"))
      stream.commit(new graft.sources.FileSetStreamOffset(Seq.empty))
      val left = java.nio.file.Files.list(seen).iterator()
      val names = {
        import scala.jdk.CollectionConverters._
        left.asScala.map(_.getFileName.toString).toSet
      }
      assert(names.contains(s"${refs.head}.txt"),
        s"the REFERENCED snapshot (epoch mtime) must survive GC, left: $names")
      // the newest-4 window holds, and unreferenced files beyond it go
      assert(!names.contains(s"${refs(1)}.txt") && !names.contains(s"${refs(2)}.txt"),
        s"unreferenced snapshots beyond the window must be pruned, left: $names")
      refs.drop(3).foreach(r => assert(names.contains(s"$r.txt"),
        s"newest-4 window must be retained, missing $r in $names"))
      // and a restarted instance can still resolve the survivor
      val stream2 = new graft.sources.TfRecordMicroBatchStream(
        TfRecordStream.feedSchema, ckpt, None, ckpt, 4)
      assert(stream2.deserializeOffset(s"""{"compact":"${refs.head}","n":1}""")
        .asInstanceOf[graft.sources.FileSetStreamOffset].files.nonEmpty)
    } finally rm(ckpt)
  }
}
