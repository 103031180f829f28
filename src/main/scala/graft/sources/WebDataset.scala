package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-webdataset`: the PyTorch-ecosystem dataloader interchange
  * format (SURVEY.md §2e) — POSIX tar shards in the WebDataset
  * convention, the second trainer hand-off format next to
  * `graft-tfrecord` (TF/JAX). Same shard=file discipline, different
  * wire format, both built against PUBLIC specs:
  *
  *   - POSIX.1-1988 ustar tar layout: 512-byte headers (name, octal
  *     size, checksum-over-header-with-spaces, typeflag), payload
  *     padded to 512, two zero blocks at end;
  *   - the WebDataset sample convention: a SAMPLE is the run of
  *     CONSECUTIVE tar members sharing a basename key (everything
  *     before the FIRST dot); the extension (everything after it) is
  *     the field name. `__key__` is the sample key pseudo-column.
  *
  * Contracts (mirroring graft-tfrecord's):
  *   - SHARD = FILE = read partition: tar has no sync markers or
  *     random-access index, so the shard count IS the read
  *     parallelism — size shards upstream (the same knob the TFRecord
  *     gate exercises).
  *   - Writes are exactly-once via staged-rename task commit
  *     (`.inprogress` → `.tar` inside DataWriter.commit) + the shared
  *     [[StagedCommit]] job protocol — zombies never publish.
  *   - CORRUPTION IS LOUD: header checksums verify on every member;
  *     a mismatch or truncated frame names the file and member —
  *     never a silent sample drop.
  *   - Column pruning reaches the scan: non-required members' payloads
  *     are SKIPPED, not read (headers must still stream past — tar is
  *     sequential by design).
  *
  * Type surface (column ↔ member payload): string ↔ UTF-8 bytes,
  * binary ↔ raw bytes, long/double ↔ ASCII decimal (the WebDataset
  * `.cls`-style convention; `Double.toString` round-trips exactly).
  * A NULL column value is an ABSENT member (the absent↔null convention
  * shared with tf.Example). A row whose non-key fields are all null
  * would be an invisible sample — the writer rejects it loudly.
  * Nested/array/decimal types fail at write-plan time.
  *
  * The sample KEY comes from the `__key__` string column (override
  * with `option("keyColumn", ...)`); it becomes the member basename,
  * so it must be tar-name-safe and UNIQUE PER ROW — each writer task
  * rejects ANY duplicate within its partition (a full per-task seen
  * set, not just adjacency). Uniqueness ACROSS partitions is the
  * caller's responsibility by default — a global check would need a
  * shuffle the writer cannot introduce; derive keys from a unique id
  * (the gates use monotonically_increasing_id / natural keys) and
  * duplicates cannot arise. Callers who want the guarantee enforced
  * can `option("auditUniqueKeys", "true")`: job commit then reads the
  * key members back (payloads pruned) and fails LOUDLY if
  * count(distinct key) != rows across all shards in the directory —
  * one count-distinct shuffle, off the write path.
  *
  * Reference for surface shape: the reference engine hands trainers
  * their data as files consumed directly
  * (uditapatel/Parallel_SVMs Driver.java:31-49); graft-webdataset is
  * that hand-off for tar-shard dataloaders.
  */
object WdsTar {
  val BlockSize = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    // POSIX numeric field: zero-padded octal, NUL terminator
    val s = java.lang.Long.toOctalString(v)
    val b = new Array[Byte](width)
    val pad = width - 1 - s.length
    require(pad >= 0, s"tar numeric field overflow: $v in $width")
    var i = 0
    while (i < pad) { b(i) = '0'; i += 1 }
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      .copyToArray(b, pad)
    b(width - 1) = 0
    b
  }

  /** One member header + payload + padding. Names must fit the ustar
    * name field (our writer generates `<key>.<column>` ≤ 100 bytes).
    */
  def writeEntry(out: java.io.OutputStream, name: String,
                 payload: Array[Byte]): Unit = {
    val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(nameBytes.length <= 100,
      s"graft-webdataset: member name '$name' exceeds the 100-byte ustar field")
    val h = new Array[Byte](BlockSize)
    nameBytes.copyToArray(h, 0)
    octal(420 /* 0644 */, 8).copyToArray(h, 100) // mode
    octal(0, 8).copyToArray(h, 108) // uid
    octal(0, 8).copyToArray(h, 116) // gid
    octal(payload.length.toLong, 12).copyToArray(h, 124) // size
    octal(0, 12).copyToArray(h, 136) // mtime: fixed 0 — deterministic shards
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum = spaces while summing
    h(156) = '0' // typeflag: regular file
    "ustar".getBytes(java.nio.charset.StandardCharsets.US_ASCII).copyToArray(h, 257)
    h(262) = 0; h(263) = '0'; h(264) = '0' // magic NUL + version "00"
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += h(i) & 0xff; i += 1 }
    // chksum field: 6-digit octal, NUL, space (the historical layout)
    val cs = java.lang.Long.toOctalString(sum)
    val csPad = 6 - cs.length
    i = 0
    while (i < csPad) { h(148 + i) = '0'; i += 1 }
    cs.getBytes(java.nio.charset.StandardCharsets.US_ASCII).copyToArray(h, 148 + csPad)
    h(154) = 0; h(155) = ' '
    out.write(h)
    out.write(payload)
    val rem = payload.length % BlockSize
    if (rem != 0) out.write(new Array[Byte](BlockSize - rem))
  }

  def writeTrailer(out: java.io.OutputStream): Unit =
    out.write(new Array[Byte](2 * BlockSize))

  /** Sequential member reader: returns (name, payloadReader) pairs;
    * verifies every header checksum; `skip=true` streams past the
    * payload without materializing it (column pruning's read path).
    */
  final class Reader(in: java.io.InputStream, file: String) {
    private val header = new Array[Byte](BlockSize)
    private var sawZero = false

    private def readFully(buf: Array[Byte], len: Int, what: String): Boolean = {
      var got = 0
      while (got < len) {
        val n = in.read(buf, got, len - got)
        if (n == -1) {
          if (got == 0) return false
          throw corrupt(s"truncated $what ($got of $len bytes)")
        }
        got += n
      }
      true
    }

    private def corrupt(why: String) = new java.io.IOException(
      s"graft-webdataset: corrupt tar $file: $why")

    private def parseOctal(off: Int, width: Int, what: String): Long = {
      var v = 0L
      var i = off
      val end = off + width
      while (i < end && (header(i) == ' '.toByte || header(i) == 0)) i += 1
      var any = false
      while (i < end && header(i) != 0 && header(i) != ' '.toByte) {
        val c = header(i) - '0'
        if (c < 0 || c > 7) throw corrupt(s"bad octal in $what")
        v = v * 8 + c
        any = true
        i += 1
      }
      if (!any) throw corrupt(s"empty octal $what")
      v
    }

    /** Next member as (name, size); null at clean end-of-archive. The
      * caller must then either [[readPayload]] or [[skipPayload]].
      */
    def nextHeader(): (String, Long) = {
      while (true) {
        if (!readFully(header, BlockSize, "header")) {
          // archives SHOULD end with two zero blocks, but a stream cut
          // exactly at a member boundary is indistinguishable from a
          // trailer-less archive; GNU tar accepts it, so do we
          return null
        }
        if (header.forall(_ == 0)) {
          if (sawZero) return null
          sawZero = true
          // one zero block: look for the second
        } else {
          if (sawZero) throw corrupt("data after end-of-archive zero block")
          var sum = 0L
          var i = 0
          while (i < BlockSize) {
            sum += (if (i >= 148 && i < 156) ' '.toByte else header(i)) & 0xff
            i += 1
          }
          val stored = parseOctal(148, 8, "chksum")
          if (sum != stored)
            throw corrupt(f"header checksum mismatch ($sum%d vs $stored%d)")
          val size = parseOctal(124, 12, "size")
          val nameEnd = {
            var e = 0
            while (e < 100 && header(e) != 0) e += 1
            e
          }
          var name = new String(header, 0, nameEnd,
            java.nio.charset.StandardCharsets.UTF_8)
          if (header(345) != 0) { // ustar prefix field in use
            var pe = 345
            while (pe < 500 && header(pe) != 0) pe += 1
            name = new String(header, 345, pe - 345,
              java.nio.charset.StandardCharsets.UTF_8) + "/" + name
          }
          val tf = header(156)
          if (tf != '0'.toByte && tf != 0)
            throw corrupt(s"unsupported tar entry type '${tf.toChar}' for $name " +
              "(pax/gnu extensions are outside the WebDataset shard convention)")
          return (name, size)
        }
      }
      null // unreachable
    }

    def readPayload(size: Long, name: String): Array[Byte] = {
      if (size > Int.MaxValue - 16)
        throw corrupt(s"member $name implausibly large ($size bytes)")
      val buf = new Array[Byte](size.toInt)
      if (!readFully(buf, size.toInt, s"payload of $name") && size > 0)
        throw corrupt(s"truncated payload of $name")
      skipPadding(size)
      buf
    }

    def skipPayload(size: Long, name: String): Unit = {
      var left = size
      while (left > 0) {
        val n = in.skip(left)
        if (n <= 0) {
          if (in.read() == -1) throw corrupt(s"truncated payload of $name")
          left -= 1
        } else left -= n
      }
      skipPadding(size)
    }

    private def skipPadding(size: Long): Unit = {
      val rem = size % BlockSize
      if (rem != 0) {
        var left = BlockSize - rem
        while (left > 0) {
          val n = in.skip(left)
          if (n <= 0) {
            if (in.read() == -1) throw corrupt("truncated padding")
            left -= 1
          } else left -= n
        }
      }
    }
  }
}

private[graft] object WdsTypes {
  val KeyColumn = "__key__"

  /** (key, extension) of a member path — the WebDataset convention:
    * the extension is everything after the FIRST dot of the BASENAME,
    * the key is the full path up to it. Splitting the basename (not
    * the whole path) keeps foreign shards with dotted directory names
    * ('imgs.v2/0001.jpg') grouping per sample instead of collapsing
    * the whole directory into one key.
    */
  def splitMember(name: String): (String, String) = {
    val base = name.lastIndexOf('/') + 1
    val dot = name.indexOf('.', base)
    if (dot < 0) (name, "") else (name.take(dot), name.drop(dot + 1))
  }

  def validate(schema: StructType, context: String): Unit =
    schema.fields.foreach { f =>
      if (f.name == KeyColumn) {
        require(f.dataType == StringType,
          s"graft-webdataset $context: $KeyColumn must be string, got ${f.dataType.simpleString}")
      } else f.dataType match {
        case LongType | DoubleType | StringType | BinaryType => ()
        case other => throw new IllegalArgumentException(
          s"graft-webdataset $context: column '${f.name}' has unsupported type " +
            s"${other.simpleString} — the member-payload surface is " +
            "long/double (ASCII), string (UTF-8), binary (raw)")
      }
    }

  /** Catalyst value → member payload bytes; null → absent member. */
  def encode(row: InternalRow, i: Int, dt: DataType): Array[Byte] =
    if (row.isNullAt(i)) null
    else dt match {
      case LongType => row.getLong(i).toString
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      case DoubleType => row.getDouble(i).toString
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      case StringType => row.getUTF8String(i).getBytes
      case BinaryType => row.getBinary(i)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

  /** Member payload bytes → Catalyst value under the required type. */
  def decode(bytes: Array[Byte], dt: DataType, file: String, field: String): Any = {
    def ascii = new String(bytes, java.nio.charset.StandardCharsets.US_ASCII).trim
    try dt match {
      case LongType => java.lang.Long.parseLong(ascii)
      case DoubleType => java.lang.Double.parseDouble(ascii)
      case StringType => UTF8String.fromBytes(bytes)
      case BinaryType => bytes
      case other => throw new IllegalStateException(s"unreachable: $other")
    } catch {
      case e: NumberFormatException => throw new java.io.IOException(
        s"graft-webdataset: member '$field' in $file is not a valid " +
          s"${dt.simpleString} payload", e)
    }
  }
}

class GraftWebDataset extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-webdataset"
  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-webdataset requires a path")
    p
  }

  /** Inference = the FIRST sample of the first shard — headers + that
    * sample's payloads only, never a data scan. Payload type guess:
    * ASCII long → long, ASCII double → double, valid UTF-8 → string,
    * else binary. A user schema (supportsExternalMetadata) overrides —
    * and should, when "123" means the string. `__key__` leads.
    */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = AvroHadoop.sessionConf()
    val dir = new Path(pathOf(options))
    val fs = dir.getFileSystem(conf)
    val first = fs.listStatus(dir).filter(st => WdsFiles.isData(st.getPath.getName))
      .sortBy(_.getPath.getName).headOption
      .getOrElse(throw new IllegalArgumentException(s"no .tar shards under $dir"))
    val in = new java.io.BufferedInputStream(fs.open(first.getPath), 1 << 16)
    try {
      val r = new WdsTar.Reader(in, first.getPath.toString)
      val fields = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
      var key: String = null
      var done = false
      while (!done) {
        val h = r.nextHeader()
        if (h == null) done = true
        else {
          val (name, size) = h
          val (k, ext) = WdsTypes.splitMember(name)
          // a dot-less member has no extension → it would infer a
          // field named "" (unaddressable); fail naming the member,
          // like the other corruption paths, rather than emit it
          if (ext.isEmpty) throw new IllegalArgumentException(
            s"graft-webdataset: member '$name' in ${first.getPath} has no " +
              "extension — every member must be <key>.<field>; supply an " +
              "explicit schema to skip inference")
          if (key == null) key = k
          if (k != key) done = true // first sample complete
          else {
            val payload = r.readPayload(size, name)
            val ascii = new String(payload,
              java.nio.charset.StandardCharsets.US_ASCII).trim
            val guess: DataType =
              if (scala.util.Try(java.lang.Long.parseLong(ascii)).isSuccess) LongType
              else if (scala.util.Try(java.lang.Double.parseDouble(ascii)).isSuccess) DoubleType
              else if (scala.util.Try(
                java.nio.charset.StandardCharsets.UTF_8.newDecoder()
                  .decode(java.nio.ByteBuffer.wrap(payload))).isSuccess) StringType
              else BinaryType
            fields += ext -> guess
          }
        }
      }
      if (fields.isEmpty) throw new IllegalArgumentException(
        s"graft-webdataset: ${first.getPath} holds no samples — supply a schema")
      StructType(
        StructField(WdsTypes.KeyColumn, StringType, nullable = true) +:
          fields.map { case (n, dt) => StructField(n, dt, nullable = true) }.toSeq)
    } finally in.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new WdsTable(schema, properties.get("path"))
}

private[graft] object WdsFiles {
  def isData(name: String): Boolean = name.endsWith(".tar")
}

class WdsTable(tableSchema: StructType, path: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-webdataset:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Set.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ)

  // the SAME option spells the key column on both sides: a write under
  // option("keyColumn", c) reads back under option("keyColumn", c) —
  // a reader-side default of __key__ alone would return the custom key
  // column as silent NULLs (round-12 self-review)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WdsScanBuilder(tableSchema, path,
      Option(options.get("keyColumn")).getOrElse(WdsTypes.KeyColumn),
      Option(options.get("maxFilesPerTrigger")).map(_.toInt),
      Option(options.get("offsetCompactionThreshold")).map(_.toInt).getOrElse(4096))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    WdsTypes.validate(info.schema(), "write")
    val keyCol = Option(info.options().get("keyColumn"))
      .getOrElse(WdsTypes.KeyColumn)
    require(info.schema().fieldNames.contains(keyCol),
      s"graft-webdataset: key column '$keyCol' absent from the written schema — " +
        "every sample needs a unique tar basename")
    val keyType = info.schema()(keyCol).dataType
    require(keyType == StringType,
      s"graft-webdataset: key column '$keyCol' must be string (it becomes the " +
        s"tar member basename), got ${keyType.simpleString} — cast it first")
    val audit = Option(info.options().get("auditUniqueKeys")).exists(_.toBoolean)
    new WdsWriteBuilder(info.schema(), path, info.queryId(), truncate = false,
      keyCol, audit)
  }
}

class WdsScanBuilder(full: StructType, path: String, keyCol: String,
                     maxFilesPerTrigger: Option[Int] = None,
                     compactionThreshold: Int = 4096)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = {
    WdsTypes.validate(required, "read")
    required.fields.find(f => f.name == keyCol && f.dataType != StringType)
      .foreach(f => throw new IllegalArgumentException(
        s"graft-webdataset: key column '$keyCol' must be string, got " +
          s"${f.dataType.simpleString}"))
    new WdsScan(required, path, keyCol, maxFilesPerTrigger, compactionThreshold)
  }
}

case class WdsInputPartition(file: String) extends InputPartition

class WdsScan(required: StructType, path: String,
              keyCol: String = WdsTypes.KeyColumn,
              maxFilesPerTrigger: Option[Int] = None,
              compactionThreshold: Int = 4096) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** The webdataset instantiation of the shared shard-directory stream
    * machinery ([[FileSetMicroBatchStream]] — file-name-set offsets,
    * content-addressed compaction, reachability-ring snapshot GC,
    * admission control): the PyTorch-format twin of graft-tfrecord's
    * round-11 stream, sharing one spec-hardened implementation.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new FileSetMicroBatchStream(
      path, maxFilesPerTrigger, checkpointLocation, compactionThreshold,
      formatName = "graft-webdataset", seenDirName = "graft-webdataset-seen",
      isData = WdsFiles.isData,
      makePartition = f => WdsInputPartition(f),
      factory = () => new WdsReaderFactory(required.json, keyCol,
        AvroHadoop.toMap(AvroHadoop.sessionConf())))

  override def description(): String =
    s"graft-webdataset $path ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(AvroHadoop.sessionConf())
    fs.listStatus(dir).filter(st => WdsFiles.isData(st.getPath.getName))
      .sortBy(_.getPath.getName)
      .map(st => WdsInputPartition(st.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WdsReaderFactory(required.json, keyCol,
      AvroHadoop.toMap(AvroHadoop.sessionConf()))
}

class WdsReaderFactory(requiredJson: String, keyCol: String,
                       confMap: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WdsInputPartition]
    val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
    new WdsPartitionReader(p.file, required, keyCol, AvroHadoop.fromMap(confMap))
  }
}

/** Consecutive-member grouping (the WebDataset sample contract): a
  * sample's row materializes when the basename key changes or the
  * archive ends. Non-required members' payloads are skipped byte-wise.
  */
class WdsPartitionReader(file: String, required: StructType, keyCol: String,
                         conf: Configuration) extends PartitionReader[InternalRow] {
  private val in = new java.io.BufferedInputStream(
    new Path(file).getFileSystem(conf).open(new Path(file)), 1 << 16)
  private val reader = new WdsTar.Reader(in, file)
  private val fieldIdx: Map[String, Int] =
    required.fieldNames.zipWithIndex.toMap
  private val keyIdx: Int = fieldIdx.getOrElse(keyCol, -1)
  private val types = required.fields.map(_.dataType)

  private var pendingKey: String = null
  private var pending: Array[Any] = null
  private var rowOut: Array[Any] = null
  private var exhausted = false

  private def flush(): Unit = {
    if (keyIdx >= 0) pending(keyIdx) = UTF8String.fromString(pendingKey)
    rowOut = pending
    pending = null
    pendingKey = null
  }

  override def next(): Boolean = {
    if (rowOut != null) return true
    while (!exhausted) {
      val h = reader.nextHeader()
      if (h == null) {
        exhausted = true
        if (pendingKey != null) { flush(); return true }
        return false
      }
      val (name, size) = h
      val (k, ext) = WdsTypes.splitMember(name)
      if (pendingKey != null && k != pendingKey) {
        // current sample complete; the new member opens the next one —
        // stash it after flushing
        flush()
        pendingKey = k
        pending = new Array[Any](required.length)
        consume(name, ext, size)
        return true
      }
      if (pendingKey == null) {
        pendingKey = k
        pending = new Array[Any](required.length)
      }
      consume(name, ext, size)
    }
    false
  }

  private def consume(name: String, ext: String, size: Long): Unit =
    fieldIdx.get(ext) match {
      case Some(i) if i != keyIdx =>
        pending(i) = WdsTypes.decode(reader.readPayload(size, name), types(i), file, ext)
      case _ => reader.skipPayload(size, name) // pruned column: skip bytes
    }

  override def get(): InternalRow = {
    val r = new GenericInternalRow(rowOut)
    rowOut = null
    r
  }

  override def close(): Unit = in.close()
}

class WdsWriteBuilder(schema: StructType, path: String, queryId: String,
                      truncate: Boolean, keyCol: String,
                      auditUniqueKeys: Boolean = false)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new WdsWriteBuilder(schema, path, queryId, truncate = true, keyCol,
      auditUniqueKeys)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new WdsBatchWrite(schema, path, queryId, truncate, keyCol,
        auditUniqueKeys)
  }
}

class WdsBatchWrite(schema: StructType, path: String, queryId: String,
                    truncate: Boolean, keyCol: String,
                    auditUniqueKeys: Boolean = false) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(AvroHadoop.sessionConf())
    if (!fs.exists(dir)) fs.mkdirs(dir)
    new WdsWriterFactory(schema.json, path, queryId, keyCol,
      AvroHadoop.toMap(AvroHadoop.sessionConf()))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    StagedCommit.jobCommit(path, queryId, truncate, WdsFiles.isData)
    // Opt-in CROSS-PARTITION duplicate-key audit (`auditUniqueKeys`):
    // the per-task seen-set above cannot see across writer partitions
    // without a shuffle the write path must not introduce, so this
    // closes that documented hole OFF the write path — a post-publish
    // read-back of key members only (payloads are pruned/skipped by
    // the scan) with one count-distinct shuffle over the whole output
    // directory. Failure is LOUD: the job errors after publish, naming
    // the duplicate count — preferred to a silent corrupt dataset, and
    // the caller opted into exactly this trade.
    if (auditUniqueKeys) {
      val spark = org.apache.spark.sql.SparkSession.active
      // explicit one-column schema, NOT inference: inference (a) names
      // the key field __key__ whatever keyColumn was (a custom-key
      // audit would fail its own select and abort a valid write) and
      // (b) reads the first shard only, throwing on a legitimately
      // empty tar from an empty write partition
      val keys = spark.read.format("graft-webdataset")
        .schema(StructType(Seq(StructField(keyCol, StringType))))
        .option("keyColumn", keyCol).load(path)
        .select(org.apache.spark.sql.functions.col(keyCol))
      val row = keys.agg(
        org.apache.spark.sql.functions.count(keyCol).as("n"),
        org.apache.spark.sql.functions.countDistinct(keyCol).as("d")).head()
      val (n, d) = (row.getLong(0), row.getLong(1))
      if (n != d) throw new IllegalStateException(
        s"graft-webdataset: auditUniqueKeys found ${n - d} cross-partition " +
          s"duplicate key(s) across $path ($n rows, $d distinct '$keyCol') — " +
          "derive keys from a unique id so shards compose into one dataset")
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    StagedCommit.jobAbort(path, queryId)
}

case class WdsCommit(file: String, rows: Long) extends WriterCommitMessage

class WdsWriterFactory(schemaJson: String, path: String, queryId: String,
                       keyCol: String,
                       confMap: Map[String, String]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    new WdsDataWriter(schema, path, queryId, partitionId, taskId, keyCol,
      AvroHadoop.fromMap(confMap))
  }
}

class WdsDataWriter(schema: StructType, path: String, queryId: String,
                    partitionId: Int, taskId: Long, keyCol: String,
                    conf: Configuration) extends DataWriter[InternalRow] {
  private val finalFile = new Path(path,
    f"part-$partitionId%05d-$queryId-$taskId.tar")
  private val stagedFile = new Path(path, finalFile.getName + ".inprogress")
  private val fs = stagedFile.getFileSystem(conf)
  private val out = new java.io.BufferedOutputStream(
    fs.create(stagedFile, false), 1 << 16)
  private val keyIdx = schema.fieldIndex(keyCol)
  private val fields = schema.fields
  // Uniqueness is enforced per WRITER TASK with a full seen-set, not
  // just adjacency: a (k1, k2, k1) task would otherwise emit two tar
  // samples with the same __key__, which the doc contract ("unique per
  // row") and downstream WebDataset loaders assume cannot exist.
  // Cross-partition duplicates remain the CALLER's responsibility (a
  // global check would need a shuffle the writer cannot introduce) —
  // stated in the WdsTable scaladoc. The set holds 64-bit key HASHES,
  // not the keys, in a primitive open-addressing table (~16 B/row
  // amortized, zero boxing — a many-million-row writer task must not
  // OOM on bookkeeping; a boxed java.util.HashSet[Long] runs ~50-60
  // B/entry); a hash collision rejects a non-duplicate LOUDLY
  // (p ≈ n²/2⁶⁵ — vanishing below billions of rows per task, and a
  // spurious error beats a silent duplicate).
  private val seenKeys = new graft.util.LongHashSet()
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(keyIdx),
      s"graft-webdataset: null sample key (column '$keyCol')")
    val key = row.getUTF8String(keyIdx).toString
    require(key.nonEmpty && !key.contains('.') && !key.contains('/'),
      s"graft-webdataset: key '$key' must be non-empty without '.' or '/' " +
        "(the basename-to-first-dot convention)")
    val keyHash = {
      val b = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      // one 64-bit pass (XXH64), not two 32-bit Murmur passes — this is
      // the per-row write path of a many-million-row task
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    }
    require(seenKeys.add(keyHash),
      s"graft-webdataset: duplicate sample key '$key' in this writer task — " +
        "consecutive-grouping readers would merge adjacent duplicates and " +
        "loaders assume __key__ is unique; keys must be unique per row")
    var wrote = 0
    var i = 0
    while (i < fields.length) {
      if (i != keyIdx) {
        val payload = WdsTypes.encode(row, i, fields(i).dataType)
        if (payload != null) {
          WdsTar.writeEntry(out, s"$key.${fields(i).name}", payload)
          wrote += 1
        }
      }
      i += 1
    }
    require(wrote > 0,
      s"graft-webdataset: sample '$key' has every field null — it would " +
        "vanish on read (absent member == null); keep one non-null field")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    WdsTar.writeTrailer(out)
    out.close()
    if (!fs.rename(stagedFile, finalFile))
      throw new java.io.IOException(
        s"graft-webdataset: rename $stagedFile -> $finalFile failed")
    WdsCommit(finalFile.toString, rows)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: java.io.IOException => () }
    if (fs.exists(stagedFile)) fs.delete(stagedFile, false)
  }

  override def close(): Unit = ()
}

/** The §2e gate query for `graft-webdataset`: write a typed lineitem
  * slice as tar shards, read it back, and report a content census FROM
  * THE READ-BACK; the oracle computes the identical census over the
  * ORIGINAL parquet — a hash match proves the wire format preserved
  * every value. Census covers the full payload surface: long + double
  * (ASCII), string (UTF-8), binary (raw), plus the `__key__` column
  * (distinct-count pins key round-tripping). Shard count is sized to
  * the cluster's parallelism — the format's own knob, exactly as in
  * the TFRecord gate.
  */
object WdsQueries {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  def srcWebdatasetRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    // sample keys must be unique per row ((l_orderkey, l_linenumber)
    // is NOT unique in this corpus): a partition-salted monotonic id —
    // key VALUES vary run to run, but the census only counts them
    // (n_keys == n_rows), which is run-stable
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        format_string("%018d", monotonically_increasing_id())
          .as(WdsTypes.KeyColumn),
        col("l_orderkey"),
        col("l_quantity").as("l_qty"),
        col("l_returnflag"),
        date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("l_ship"),
        encode(col("l_returnflag"), "UTF-8").as("l_flagbin"))
    val dir = java.nio.file.Files.createTempDirectory("graft-wds-rt-")
    try {
      df.repartition(spark.sparkContext.defaultParallelism)
        .write.format("graft-webdataset").mode("append").save(dir.toString)
      val census = spark.read.format("graft-webdataset").schema(df.schema)
        .load(dir.toString).agg(
          count(lit(1)).as("n_rows"),
          countDistinct(WdsTypes.KeyColumn).as("n_keys"),
          sum("l_orderkey").as("sum_orderkey"),
          sum(floor(col("l_qty") * 100 + 0.5)).as("qty_cents"),
          countDistinct("l_returnflag").as("n_flags"),
          sum(length(col("l_flagbin")).cast("long")).as("bin_bytes"),
          min("l_ship").as("min_ship"),
          max("l_ship").as("max_ship"))
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(census.collect().toSeq.asJava, census.schema)
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  /** The identical census over the ORIGINAL table. */
  val oracleSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(*) AS BIGINT) AS n_keys,
      |  CAST(sum(l_orderkey) AS BIGINT) AS sum_orderkey,
      |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_cents,
      |  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_flags,
      |  CAST(sum(octet_length(encode(l_returnflag))) AS BIGINT) AS bin_bytes,
      |  strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_ship,
      |  strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_ship
      |FROM lineitem""".stripMargin
}
