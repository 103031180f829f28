package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** `stream_tfrecord_sink` (SURVEY §2d): the streaming WRITE of the
  * trainer hand-off (round-11 verdict #3) — closing the loop
  * "stream in → curate → shards out" that a continual-pretraining feed
  * runs: TFRecord shards arrive as a stream (the graft-tfrecord
  * MicroBatchStream), a curation filter runs per micro-batch, and the
  * surviving rows are published as NEW TFRecord shards EXACTLY-ONCE
  * against the query's checkpoint.
  *
  * Exactly-once protocol (the FileStreamSink discipline applied to
  * TfRecordBatchWrite): each micro-batch writes its shards through the
  * normal batch path (task-level staged-rename: zombies never publish
  * — TfRecord.scala), then publishes a per-batch MANIFEST naming the
  * files it added, via tmp+rename (the atomic commit point). A
  * replayed batch id (restart between the sink commit and the offsets
  * commit — foreachBatch's documented re-delivery window) finds its
  * manifest and is a NO-OP; a crashed attempt's unmanifested files are
  * swept before the retry writes, and readers resolve the committed
  * file set THROUGH the manifests, so stray physical files are never
  * data. This is the ChainedState `_SUCCESS` batch-id idempotence
  * (round-10 verdict #2) applied to a file sink.
  *
  * Scale shape: one delta manifest (O(files-per-batch) bytes) per
  * batch, COMPACTED every 10 batches into one `<id>.compact` (the
  * FileStreamSink compact-log discipline) so a commit reads one
  * compact + ≤10 deltas regardless of stream age — never one file per
  * historical batch; the sweep and read-back list one directory;
  * shard = file = read partition exactly as in batch TFRecord IO, so
  * downstream dataloader parallelism is the shard count the stream
  * was sized to.
  *
  * OWNERSHIP: the sink owns `outDir` EXCLUSIVELY. The crash-residue
  * sweep deletes any data file its manifests do not name, so pointing
  * a second streaming query (or a manual batch append) at the same
  * directory loses that data — each swept file is logged by name so
  * such a misconfiguration is visible, but the contract is one sink,
  * one directory.
  */
object TfRecordSink {

  private val CommitsDir = "_graft_commits"

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)

  private def listData(dir: String): Seq[String] = {
    val fs = fsOf(dir)
    val p = new Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(graft.sources.TfRecordFiles.isData).sorted.toSeq
  }

  /** Merge every `CompactEvery`-th batch's manifests into one
    * `<id>.compact` (the FileStreamSink compact-log discipline): the
    * per-batch commit cost stays one compacted read + O(K) delta reads
    * instead of growing one manifest file per batch forever — at batch
    * 10,000 the naive shape would open 10,000 files per trigger.
    */
  private val CompactEvery = 10L

  private def readLines(fs: org.apache.hadoop.fs.FileSystem,
                        p: Path, len: Long): Seq[String] = {
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    new String(buf, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty).toSeq
  }

  /** (newest compact id or -1, that compact's files). */
  private def newestCompact(fs: org.apache.hadoop.fs.FileSystem,
                            commits: Path): (Long, Seq[String]) = {
    if (!fs.exists(commits)) return (-1L, Seq.empty)
    val compacts = fs.listStatus(commits)
      .filter(_.getPath.getName.endsWith(".compact"))
      .filter(_.getPath.getName.stripSuffix(".compact").forall(_.isDigit))
    if (compacts.isEmpty) (-1L, Seq.empty)
    else {
      val st = compacts.maxBy(_.getPath.getName.stripSuffix(".compact").toLong)
      (st.getPath.getName.stripSuffix(".compact").toLong,
        readLines(fs, st.getPath, st.getLen))
    }
  }

  /** File names published by committed manifests, in batch order: the
    * newest compact's list plus the delta manifests after it.
    */
  def committedFiles(outDir: String): Seq[String] = {
    val fs = fsOf(outDir)
    val commits = new Path(outDir, CommitsDir)
    if (!fs.exists(commits)) return Seq.empty
    val (compactId, base) = newestCompact(fs, commits)
    val deltas = fs.listStatus(commits)
      .filter(_.getPath.getName.forall(_.isDigit))
      .filter(_.getPath.getName.toLong > compactId)
      .sortBy(_.getPath.getName.toLong)
      .flatMap(st => readLines(fs, st.getPath, st.getLen))
    base ++ deltas
  }

  /** Publish one micro-batch exactly-once: skip if this batch id is
    * already committed (its delta manifest exists, or it is covered by
    * a compact — replay), sweep unmanifested residue (a crashed
    * attempt), write shards, manifest the delta atomically, compact
    * every `CompactEvery` batches.
    */
  def commitBatch(df: DataFrame, batchId: Long, outDir: String): Unit = {
    val fs = fsOf(outDir)
    val commits = new Path(outDir, CommitsDir)
    val manifest = new Path(commits, batchId.toString)
    if (fs.exists(manifest)) return // replayed batch: already published
    val (compactId, _) = newestCompact(fs, commits)
    if (batchId <= compactId) return // replay of a compacted batch
    if (!fs.exists(commits)) fs.mkdirs(commits)
    val published = committedFiles(outDir).toSet
    // residue from a crashed attempt of this (or any) uncommitted
    // batch: physically present, named by no manifest — sweep so the
    // retry's before/after diff and the final directory stay clean.
    // EXCLUSIVE-OWNERSHIP CONTRACT: this sink assumes it is the only
    // writer of outDir — any data file not named by its manifests is
    // treated as crash residue, so a second streaming query or a
    // manual batch append into the same directory WOULD be deleted
    // here. Each sweep victim is logged by name so foreign-data loss
    // is visible in the driver log, never silent.
    listData(outDir).filterNot(published).foreach { n =>
      System.err.println(
        s"graft-tfrecord-sink: sweeping unmanifested file '$n' from $outDir " +
          "(crash residue — this sink owns the directory exclusively)")
      fs.delete(new Path(outDir, n), false)
    }
    val before = listData(outDir).toSet
    df.write.format("graft-tfrecord").mode("append").save(outDir)
    val added = listData(outDir).filterNot(before)
    writeAtomic(fs, commits, new Path(commits, s".${batchId}.tmp"), manifest,
      added, s"batch $batchId manifest")
    if (batchId % CompactEvery == CompactEvery - 1) {
      val full = committedFiles(outDir) // includes the delta just written
      val target = new Path(commits, s"$batchId.compact")
      writeAtomic(fs, commits, new Path(commits, s".$batchId.compact.tmp"),
        target, full, s"batch $batchId compact")
      // superseded logs go last: a crash here leaves both forms, and
      // committedFiles resolves compact-first so nothing double-counts
      fs.listStatus(commits).foreach { st =>
        val n = st.getPath.getName
        if ((n.forall(_.isDigit) && n.toLong <= batchId) ||
          (n.endsWith(".compact") && n != target.getName &&
            n.stripSuffix(".compact").forall(_.isDigit)))
          fs.delete(st.getPath, false)
      }
    }
  }

  private def writeAtomic(fs: org.apache.hadoop.fs.FileSystem, commits: Path,
                          tmp: Path, target: Path, lines: Seq[String],
                          what: String): Unit = {
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"graft-tfrecord-sink: cannot commit $what")
  }

  /** Read back exactly the manifested shards (stray files are not
    * data), each file one partition — the sink's own commit log is the
    * source of truth, as with Spark's parquet streaming sink.
    */
  def readCommitted(spark: SparkSession, schema: StructType,
                    outDir: String): DataFrame = {
    val files = committedFiles(outDir)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    files.foldLeft(empty) { (acc, n) =>
      acc.union(spark.read.format("graft-tfrecord").schema(schema)
        .load(new Path(outDir, n).toString))
    }
  }

  /** Minimum token count a document must reach to ship to the trainer
    * — the curation step between stream-in and shards-out.
    */
  val MinTokens = 16L

  /** The §2d gate: feed shards → stream (3 micro-batches) → curate →
    * exactly-once TFRecord shards out → census FROM THE READ-BACK of
    * the sink's committed files; the oracle computes the identical
    * census over the ORIGINAL documents table with the same filter.
    */
  def streamTfRecordSink(spark: SparkSession, sfDir: String): DataFrame = {
    val feed = java.nio.file.Files.createTempDirectory("graft-tfrsink-feed-")
    val out = java.nio.file.Files.createTempDirectory("graft-tfrsink-out-")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tfrsink-ckpt-")
    try {
      TfRecordStream.records(spark, sfDir)
        .repartition(TfRecordStream.FeedShards)
        .write.format("graft-tfrecord").mode("append").save(feed.toString)
      runCurateToSink(spark, feed.toString, out.toString, ckpt.toString)
      val census = readCommitted(spark, TfRecordStream.feedSchema, out.toString)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("sum_tokens"),
          sum("doc_id").as("sum_doc_id"))
        .orderBy("lang")
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(census.collect().toSeq.asJava, census.schema)
    } finally {
      graft.util.Fs.deleteRecursively(feed)
      graft.util.Fs.deleteRecursively(out)
      graft.util.Fs.deleteRecursively(ckpt)
    }
  }

  /** One bounded run of the curate-and-publish stream against a
    * checkpoint (restartable: the spec drives waves through it).
    */
  def runCurateToSink(spark: SparkSession, feedDir: String,
                      outDir: String, ckptDir: String): Unit = {
    val q = spark.readStream.format("graft-tfrecord")
      .schema(TfRecordStream.feedSchema)
      .option("maxFilesPerTrigger", TfRecordStream.FilesPerTrigger)
      .load(feedDir)
      .filter(col("n_tokens") >= MinTokens)
      .writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckptDir)
      .foreachBatch((batch: DataFrame, id: Long) => commitBatch(batch, id, outDir))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The identical census over the ORIGINAL documents table (DuckDB's
    * tokenizer-equivalence expression — the pinned regex census).
    */
  val oracleSql: String =
    s"""SELECT lang,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
       |FROM (
       |  SELECT doc_id, lang,
       |    CAST(length(regexp_extract_all(text, '[A-Za-z]+'))
       |       + length(regexp_extract_all(text, '[0-9]+'))
       |       + length(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tokens
       |  FROM documents)
       |WHERE n_tokens >= ${MinTokens}
       |GROUP BY lang ORDER BY lang""".stripMargin
}
