package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}

/** Shared micro-batch machinery for append-only SHARD-DIRECTORY feeds
  * (round 12: factored out of the round-11 `graft-tfrecord` stream so
  * `graft-webdataset` ingests through the IDENTICAL, already
  * spec-hardened offset discipline rather than a copy).
  *
  * Streaming offset = the SORTED set of data-file NAMES already
  * admitted. Name-set membership — not a (mtime, name) watermark —
  * makes exactly-once independent of arrival order and clock skew: a
  * file that appears with a BACKDATED mtime (a cross-FS copy, a slow
  * writer racing a fast one) is still "new" because its name is not in
  * the set.
  *
  * Serialization is COMPACTED past a threshold (the 100 TB path): a
  * small set serializes as a plain JSON array; a large one is written
  * ONCE to a content-addressed file under the query's checkpoint
  * (`<seenDirName>/<md5>.txt`, durable exactly as long as the offsets
  * log that references it) and the offset serializes as
  * `{"compact": "<md5>", "n": <count>}` — O(1) in the offsets log per
  * batch regardless of files seen, the same shape as
  * FileStreamSource's compacted seen-file log. Content addressing
  * makes the persist idempotent and offset-json equality still means
  * set equality (Spark compares offset JSON to detect no-new-data).
  */
case class FileSetStreamOffset(files: Seq[String], ref: Option[String] = None)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    ref match {
      case Some(r) => s"""{"compact":${m.writeValueAsString(r)},"n":${files.size}}"""
      case None =>
        import scala.jdk.CollectionConverters._
        m.writeValueAsString(files.asJava)
    }
  }
}

object FileSetStreamOffset {
  /** Parse the PLAIN form; the compact form needs the checkpoint dir —
    * [[FileSetMicroBatchStream.deserializeOffset]] resolves it.
    */
  def fromJson(json: String): FileSetStreamOffset = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    FileSetStreamOffset(m.readValue(json, classOf[Array[String]]).toSeq)
  }

  def compactRefOf(json: String): Option[String] =
    if (!json.trim.startsWith("{")) None
    else {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      Option(node.get("compact")).map(_.asText())
    }
}

/** Micro-batch streaming read over an append-only shard directory
  * (the dataloader-feed tail of the pipeline as a STREAM). A batch =
  * the set difference between two file-name-set offsets; each admitted
  * file is one partition (shard = file, exactly as in batch reads).
  * Published files must be immutable (both sinks' staged-rename commit
  * guarantees readers never admit a half-written `.inprogress` file).
  * Admission control: `maxFilesPerTrigger` bounds a batch; under
  * Trigger.AvailableNow the listing is frozen at query start so the
  * run is bounded even while writers keep appending.
  *
  * @param formatName    error-message prefix ("graft-tfrecord", …)
  * @param seenDirName   checkpoint subdir for compacted seen-sets
  *                      (format-specific so existing tfrecord
  *                      checkpoints keep resolving)
  * @param isData        the format's data-file name rule
  * @param makePartition full file path → the format's InputPartition
  * @param factory       the format's PartitionReaderFactory (built
  *                      lazily on the driver at plan time)
  */
class FileSetMicroBatchStream(
    path: String,
    maxFilesPerTrigger: Option[Int],
    checkpointLocation: String,
    compactionThreshold: Int,
    formatName: String,
    seenDirName: String,
    isData: String => Boolean,
    makePartition: String => InputPartition,
    factory: () => PartitionReaderFactory)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => StreamOffset, ReadLimit, ReadMaxFiles}

  @volatile private var availableNowBound: Option[Set[String]] = None

  // ---- offset compaction (see FileSetStreamOffset's scaladoc) ----
  private def seenDir = new Path(checkpointLocation, seenDirName)

  /** The most recent compact refs this instance handed out
    * (maybeCompact) or resolved (loadCompact) — a recency ring of 8.
    * GC retains BY REACHABILITY against this ring, not by file mtime:
    * a restart resolves the latest AND previous offsets-log entries,
    * whose refs were handed out within the last two triggers (at most
    * two persists per trigger: latestOffset + reportLatestOffset), so
    * the last 8 refs cover everything the offsets log can still name
    * with 2× slack — where a newest-K-by-mtime window has ZERO slack
    * and one extra persist (or an mtime tie on a second-granularity
    * filesystem) could evict a still-referenced snapshot, leaving the
    * checkpoint unrestartable. The ring (not an unbounded set) keeps
    * GC real: protecting every ref ever handed out would grow the
    * checkpoint one snapshot per listing change forever.
    */
  private val liveRefs = new java.util.ArrayDeque[String](8)
  private def registerRef(ref: String): Unit = liveRefs.synchronized {
    liveRefs.remove(ref) // refresh recency if already present
    liveRefs.addLast(ref)
    while (liveRefs.size > 8) liveRefs.pollFirst()
  }

  /** Past the threshold, persist the sorted name list once
    * (content-addressed, so re-persisting the same set is a no-op and
    * equal sets serialize identically) and hand out a ref offset.
    */
  private def maybeCompact(files: Seq[String]): FileSetStreamOffset = {
    if (files.size <= compactionThreshold || checkpointLocation.isEmpty)
      return FileSetStreamOffset(files)
    val payload = files.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(payload).map("%02x".format(_)).mkString
    val fs = seenDir.getFileSystem(AvroHadoop.sessionConf())
    val target = new Path(seenDir, s"$md5.txt")
    if (!fs.exists(target)) {
      if (!fs.exists(seenDir)) fs.mkdirs(seenDir)
      val tmp = new Path(seenDir, s".$md5.txt.tmp")
      val out = fs.create(tmp, true)
      try out.write(payload) finally out.close()
      if (!fs.rename(tmp, target)) {
        // a concurrent identical persist can win the rename — same
        // content by construction, so losing is fine; sweep our tmp
        if (fs.exists(tmp)) fs.delete(tmp, false)
        if (!fs.exists(target))
          throw new java.io.IOException(s"$formatName: cannot persist offset $target")
      }
    }
    registerRef(md5)
    FileSetStreamOffset(files, Some(md5))
  }

  private def loadCompact(ref: String): FileSetStreamOffset = {
    val fs = seenDir.getFileSystem(AvroHadoop.sessionConf())
    val target = new Path(seenDir, s"$ref.txt")
    val len = fs.getFileStatus(target).getLen
    if (len > Int.MaxValue - 8) throw new java.io.IOException(
      s"$formatName: seen-set snapshot $target is $len bytes — beyond " +
        "the in-memory offset model; shard the feed across directories")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(target)
    try in.readFully(0, bytes) finally in.close()
    val files = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty).toSeq
    registerRef(ref) // a ref the offsets log demonstrably references
    FileSetStreamOffset(files, Some(ref))
  }

  private def listNow(): Seq[String] = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(AvroHadoop.sessionConf())
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(isData).sorted.toSeq
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound = Some(listNow().toSet)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: StreamOffset, limit: ReadLimit): StreamOffset = {
    val seen = start.asInstanceOf[FileSetStreamOffset].files.toSet
    val visible = availableNowBound match {
      case Some(bound) => listNow().filter(bound)
      case None => listNow()
    }
    val fresh = visible.filterNot(seen) // already name-sorted
    val admitted = limit match {
      case mf: ReadMaxFiles => fresh.take(mf.maxFiles)
      case _ => fresh
    }
    maybeCompact((seen ++ admitted).toSeq.sorted)
  }

  override def latestOffset(): StreamOffset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-controlled entry point")

  // compact form here too: progress events embed this json, and a
  // plain million-name array per trigger would re-create the unbounded
  // offset problem in the listener bus / recentProgress retention
  override def reportLatestOffset(): StreamOffset = maybeCompact(listNow())

  override def initialOffset(): StreamOffset = FileSetStreamOffset(Seq.empty)

  override def deserializeOffset(json: String): StreamOffset =
    FileSetStreamOffset.compactRefOf(json) match {
      case Some(ref) => loadCompact(ref)
      case None => FileSetStreamOffset.fromJson(json)
    }

  override def planInputPartitions(start: StreamOffset, end: StreamOffset): Array[InputPartition] = {
    val before = start.asInstanceOf[FileSetStreamOffset].files.toSet
    val after = end.asInstanceOf[FileSetStreamOffset].files
    after.filterNot(before).sorted
      .map(n => makePartition(new Path(path, n).toString))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = factory()

  /** Prune superseded seen-set snapshots at commit: without pruning
    * the checkpoint grows one full snapshot per trigger (quadratic
    * over the stream's life). Retention is BY REACHABILITY: any ref in
    * the [[liveRefs]] recency ring is never deleted — the ring covers
    * everything the offsets log can still name (latestOffset persists,
    * reportLatestOffset persists, and at restart populateStartOffsets
    * resolves the latest and previous entries through loadCompact,
    * which re-registers them). A newest-K=4 mtime window is kept ON
    * TOP as slack for anything in flight, but it is a supplement, not
    * the safety argument — an mtime tie, a backdated copy, or an extra
    * persist cannot evict a referenced snapshot. Bound: ≤ 8 + 4 files.
    */
  override def commit(end: org.apache.spark.sql.connector.read.streaming.Offset): Unit = {
    val fs = seenDir.getFileSystem(AvroHadoop.sessionConf())
    if (fs.exists(seenDir)) {
      val protect = liveRefs.synchronized {
        val s = Set.newBuilder[String]
        liveRefs.forEach(r => s += r)
        s.result()
      }
      fs.listStatus(seenDir).filter(_.getPath.getName.endsWith(".txt"))
        .sortBy(-_.getModificationTime)
        .drop(4)
        .filterNot(st => protect.contains(
          st.getPath.getName.stripSuffix(".txt")))
        .foreach(st => fs.delete(st.getPath, false))
    }
  }

  override def stop(): Unit = ()
}
