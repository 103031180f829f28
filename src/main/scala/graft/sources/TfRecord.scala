package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** TFRecord source/sink (`graft-tfrecord`) — the packed-training-data
  * interchange format every TF/JAX dataloader consumes, implemented as
  * a DataSource V2 `TableProvider` against two PUBLIC specifications
  * and nothing else:
  *
  *   - the TFRecord FRAMING (TensorFlow's `tensorflow/core/lib/io/
  *     record_writer` format, documented in the TF data guide):
  *     `uint64 length (LE) · uint32 masked-crc32c(length) · payload ·
  *     uint32 masked-crc32c(payload)`, mask(c) = ((c >>> 15) |
  *     (c << 17)) + 0xa282ead8. CRC32C is `java.util.zip.CRC32C`
  *     (JDK 9+) — no external dependency.
  *   - the `tf.train.Example` protobuf (feature.proto / example.proto),
  *     hand-encoded against the public protobuf WIRE format (varints,
  *     length-delimited submessages): Example{1: Features}, Features
  *     {1: map<string, Feature>}, Feature{1: BytesList | 2: FloatList
  *     | 3: Int64List}, each list `repeated field 1` — the decoder
  *     accepts both PACKED and UNPACKED repeated encodings (writers
  *     differ; the spec allows either), the encoder emits packed
  *     numerics (the compact form protoc emits).
  *
  * Scale design — what matters at 100 TB:
  *   - SHARD = FILE. TFRecord has no sync markers, so a file is NOT
  *     byte-range splittable; a read partition is one whole file. This
  *     is the format's own contract (TF dataloaders parallelize across
  *     files too), so the SHARD COUNT IS THE PARALLELISM KNOB: the
  *     writer emits one file per task, and the upstream
  *     `repartition(nShards)` decides both file count and size —
  *     exactly the corpus_shuffle_write discipline (SURVEY §2 row
  *     31o2). A 100 TB export wants O(10k) shards of a few GB, not ten
  *     10 TB files.
  *   - PRUNING IN THE DECODER: `SupportsPushDownRequiredColumns`
  *     narrows the feature set; non-projected features are SKIPPED at
  *     the wire level (a length-delimited skip — no list decode, no
  *     allocation), the row-format analog of ReadSchema pruning,
  *     spec-pinned via the scan's readSchema.
  *   - DISTRIBUTED WRITES, CRASH-SAFE COMMIT: each task streams
  *     framed records straight to the target FS (no driver funnel)
  *     into a STAGED `….tfrecord.inprogress` name, renamed inside
  *     `DataWriter.commit()` (granted to exactly one attempt by
  *     Spark's commit coordinator) — a zombie attempt never
  *     contributes a visible file. Files carry the query UUID;
  *     truncate-overwrite deletes exactly the previous queries' files
  *     plus stale staging residue. Concurrent COMMITTED writers racing
  *     a truncate are unsupported (same contract as Spark's built-in
  *     file sources).
  *   - CORRUPTION IS LOUD: both CRCs are verified on every record; a
  *     mismatch or truncated frame raises an error naming the file and
  *     byte offset — never a silent row drop (a dataloader that trains
  *     on a corrupt shard is the worst failure mode of this format).
  *
  * Type surface (column ↔ feature): long/int/boolean ↔ Int64List,
  * float/double ↔ FloatList (float32 is the FORMAT's precision — a
  * double column round-trips through float32, the documented tf.Example
  * contract), string/binary ↔ BytesList, and arrays of each. A NULL
  * column value is an ABSENT feature (tf.Example has no null; absent ↔
  * null is the standard convention) — consequently an ARRAY column
  * must not carry empty arrays (absent and empty are the same wire
  * state; the writer rejects empty arrays loudly rather than letting
  * [] come back as null). Anything else (nested structs, maps,
  * decimals) fails loudly at write-plan time.
  *
  * Compression: `option("compression", "gzip")` writes `.tfrecord.gz`
  * (whole-file GZIP — TF's own record-reader compression option; the
  * framing inside is identical). Per-file, suffix-dispatched: a
  * directory may mix plain and gz shards and the reader handles each
  * by name. GZIP'd files are still one-partition reads (gzip is not
  * splittable either — the shard-count-is-parallelism contract is
  * unchanged).
  *
  * Schema-on-read: user-supplied schema (`supportsExternalMetadata`)
  * is authoritative — features decode AS the required Spark type, a
  * scalar type asserts list length == 1 (violations name the file and
  * feature). Without a user schema, inference reads the FIRST record
  * of the lexicographically first file (never a data scan): int64 →
  * long, float → float, bytes → binary; list length != 1 → array
  * thereof. Unlike Avro there is NO writer schema to validate a
  * required column against: tf.Example features are per-record and
  * sparse by design (absent = null is the format's semantics), so a
  * misspelled column name reads as all-null rather than erroring —
  * that is the format's contract, not a gap this source can close. Reference for surface shape: the reference engine ships
  * its training sets as files the trainer consumes directly
  * (uditapatel/Parallel_SVMs Driver.java:31-49 distributes
  * partitioned training files); graft-tfrecord is that same "hand the
  * trainer its shards" stage for a tensor-native dataloader.
  */
object TfRecordFraming {
  /** TFRecord's masked CRC32C (uint32 arithmetic; Int wraps identically). */
  def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C
    c.update(bytes, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }
  private def getIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def getLongLE(b: Array[Byte], off: Int): Long = {
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  def writeRecord(out: java.io.OutputStream, payload: Array[Byte]): Unit = {
    val header = new Array[Byte](12)
    var v = payload.length.toLong
    var i = 0
    while (i < 8) { header(i) = v.toByte; v >>>= 8; i += 1 }
    putIntLE(header, 8, maskedCrc(header, 0, 8))
    out.write(header, 0, 12)
    out.write(payload)
    val footer = new Array[Byte](4)
    putIntLE(footer, 0, maskedCrc(payload, 0, payload.length))
    out.write(footer, 0, 4)
  }

  /** Next record's payload, or null at a CLEAN end-of-file. A partial
    * frame or CRC mismatch is corruption and raises, naming file+offset.
    */
  def readRecord(in: java.io.InputStream, file: String, offset: Long): Array[Byte] = {
    val header = new Array[Byte](12)
    val first = in.read(header, 0, 12)
    if (first == -1) return null
    var got = first
    while (got < 12) {
      val n = in.read(header, got, 12 - got)
      if (n == -1) throw corrupt(file, offset, s"truncated frame header ($got of 12 bytes)")
      got += n
    }
    if (getIntLE(header, 8) != maskedCrc(header, 0, 8))
      throw corrupt(file, offset, "length CRC mismatch")
    val len = getLongLE(header, 0)
    if (len < 0 || len > Int.MaxValue - 16)
      throw corrupt(file, offset, s"implausible record length $len")
    val payload = new Array[Byte](len.toInt)
    got = 0
    while (got < len) {
      val n = in.read(payload, got, len.toInt - got)
      if (n == -1) throw corrupt(file, offset, s"truncated payload ($got of $len bytes)")
      got += n
    }
    val footer = new Array[Byte](4)
    got = 0
    while (got < 4) {
      val n = in.read(footer, got, 4 - got)
      if (n == -1) throw corrupt(file, offset, "truncated payload CRC")
      got += n
    }
    if (getIntLE(footer, 0) != maskedCrc(payload, 0, payload.length))
      throw corrupt(file, offset, "payload CRC mismatch")
    payload
  }

  def framedSize(payloadLen: Int): Long = 16L + payloadLen

  private def corrupt(file: String, offset: Long, why: String) = {
    // the reader counts DECOMPRESSED bytes: for a .gz shard that
    // position does not exist in the on-disk file, so label it — an
    // operator seeking the physical file to a record-stream offset
    // would land on a meaningless byte
    val where =
      if (file.endsWith(".gz")) s"uncompressed (record-stream) byte offset $offset"
      else s"byte offset $offset"
    new java.io.IOException(
      s"graft-tfrecord: corrupt record in $file at $where: $why")
  }
}

/** Minimal protobuf wire-format writer (public encoding: varints,
  * length-delimited). Grows geometrically; one per writer task, reset
  * per row — no per-row allocation churn beyond the feature arrays.
  */
final class ProtoBuf(initial: Int = 512) {
  private var buf = new Array[Byte](initial)
  private var len = 0
  def size: Int = len
  def reset(): Unit = len = 0
  def toByteArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  private def ensure(n: Int): Unit =
    if (len + n > buf.length)
      buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + n))
  def writeRaw(b: Array[Byte], off: Int, n: Int): Unit = {
    ensure(n); System.arraycopy(b, off, buf, len, n); len += n
  }
  def writeVarint(v0: Long): Unit = {
    ensure(10)
    var v = v0
    while ((v & ~0x7fL) != 0) { buf(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v >>>= 7 }
    buf(len) = v.toByte; len += 1
  }
  def writeTag(field: Int, wire: Int): Unit = writeVarint(((field.toLong) << 3) | wire)
  def writeFloatLE(f: Float): Unit = {
    ensure(4)
    val bits = java.lang.Float.floatToIntBits(f)
    buf(len) = bits.toByte; buf(len + 1) = (bits >>> 8).toByte
    buf(len + 2) = (bits >>> 16).toByte; buf(len + 3) = (bits >>> 24).toByte
    len += 4
  }
  /** tag + length + nested message (copied from another builder). */
  def writeMessage(field: Int, inner: ProtoBuf): Unit = {
    writeTag(field, 2); writeVarint(inner.size); writeRaw(inner.bufRef, 0, inner.size)
  }
  def writeBytesField(field: Int, b: Array[Byte]): Unit = {
    writeTag(field, 2); writeVarint(b.length); writeRaw(b, 0, b.length)
  }
  private def bufRef: Array[Byte] = buf
}

/** Minimal protobuf wire-format reader over a byte slice. */
final class ProtoReader(val buf: Array[Byte], var pos: Int, val end: Int) {
  def hasMore: Boolean = pos < end
  def readVarint(): Long = {
    var shift = 0; var v = 0L
    while (true) {
      if (pos >= end) throw new java.io.IOException("graft-tfrecord: truncated varint")
      val b = buf(pos); pos += 1
      v |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return v
      shift += 7
      if (shift > 63) throw new java.io.IOException("graft-tfrecord: varint overflow")
    }
    v // unreachable
  }
  def readTag(): Int = readVarint().toInt
  def readFloatLE(): Float = {
    if (pos + 4 > end) throw new java.io.IOException("graft-tfrecord: truncated float")
    val bits = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
      ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
    pos += 4
    java.lang.Float.intBitsToFloat(bits)
  }
  /** Length-delimited region: returns (start, end) and advances past it.
    * Subtraction-form bound (`n > end - pos`): an adversarial varint
    * whose toInt is huge-positive would overflow an addition-form
    * `pos + n > end` check into a false pass.
    */
  def readRegion(): (Int, Int) = {
    val n = readVarint().toInt
    if (n < 0 || n > end - pos)
      throw new java.io.IOException(s"graft-tfrecord: bad length $n")
    val s = pos; pos += n; (s, s + n)
  }
  /** Every skip is bounds-checked: the frame CRC covers whatever bytes
    * the writer produced, so a CRC-VALID but malformed payload (e.g. a
    * negative length-delimited size that would move `pos` BACKWARDS
    * into an infinite loop) must still fail loudly here.
    */
  def skipField(tag: Int): Unit = (tag & 7) match {
    case 0 => readVarint()
    case 1 =>
      if (end - pos < 8) throw new java.io.IOException("graft-tfrecord: truncated fixed64")
      pos += 8
    case 2 =>
      val n = readVarint().toInt
      if (n < 0 || n > end - pos)
        throw new java.io.IOException(s"graft-tfrecord: bad skip length $n")
      pos += n
    case 5 =>
      if (end - pos < 4) throw new java.io.IOException("graft-tfrecord: truncated fixed32")
      pos += 4
    case w => throw new java.io.IOException(s"graft-tfrecord: unsupported wire type $w")
  }
}

/** tf.train.Example encode/decode against the public proto schema.
  * Field numbers: Example.features = 1; Features.feature (map) = 1;
  * map entry key = 1, value = 2; Feature.bytes_list = 1,
  * .float_list = 2, .int64_list = 3; every list's repeated value = 1.
  */
object TfExample {
  final val WIRE_VARINT = 0
  final val WIRE_LEN = 2
  final val WIRE_I32 = 5

  sealed trait FeatureValue
  final case class I64s(v: Array[Long]) extends FeatureValue
  final case class F32s(v: Array[Float]) extends FeatureValue
  final case class Bytes(v: Array[Array[Byte]]) extends FeatureValue

  /** One-shot encode (tests/tools). The hot path is TfExampleEncoder. */
  def encode(features: Array[(Array[Byte], FeatureValue)]): Array[Byte] =
    new TfExampleEncoder().encode(features.map(_._1), features.map(_._2))

  /** Per-task Example encoder: every builder lives for the WRITER TASK
    * and is reset per row/feature — the per-row cost is the feature
    * arrays themselves, not builder churn (this is the 100 TB export's
    * hot path). Not thread-safe; one per DataWriter, like the writer.
    */
  final class TfExampleEncoder {
    private val featuresMsg = new ProtoBuf()
    private val entry = new ProtoBuf()
    private val featureMsg = new ProtoBuf()
    private val list = new ProtoBuf()
    private val packed = new ProtoBuf()
    private val example = new ProtoBuf()

    /** `keys` positional over `values`; a null value = absent feature. */
    def encode(keys: Array[Array[Byte]], values: Array[FeatureValue]): Array[Byte] = {
      featuresMsg.reset()
      var i = 0
      while (i < keys.length) {
        val value = values(i)
        if (value != null) {
          entry.reset(); featureMsg.reset(); list.reset()
          value match {
            case I64s(vs) =>
              packed.reset()
              vs.foreach(packed.writeVarint)
              list.writeMessage(1, packed) // packed repeated int64, field 1
              featureMsg.writeMessage(3, list)
            case F32s(vs) =>
              packed.reset()
              vs.foreach(packed.writeFloatLE)
              list.writeMessage(1, packed)
              featureMsg.writeMessage(2, list)
            case Bytes(vs) =>
              vs.foreach(b => list.writeBytesField(1, b))
              featureMsg.writeMessage(1, list)
          }
          entry.writeBytesField(1, keys(i))
          entry.writeMessage(2, featureMsg)
          featuresMsg.writeMessage(1, entry)
        }
        i += 1
      }
      example.reset()
      example.writeMessage(1, featuresMsg)
      example.toByteArray
    }
  }

  /** Walk every (key, Feature-value region) pair of one Example —
    * the ONE copy of the Example/Features/map-entry wire walk, shared
    * by row decoding and schema inference. Non-visited bytes are
    * skipped at the wire level (no list decode).
    */
  def foreachFeature(payload: Array[Byte])(f: (String, (Int, Int)) => Unit): Unit = {
    val r = new ProtoReader(payload, 0, payload.length)
    while (r.hasMore) {
      val tag = r.readTag()
      if (tag == ((1 << 3) | WIRE_LEN)) { // Example.features
        val (fs, fe) = r.readRegion()
        val fr = new ProtoReader(payload, fs, fe)
        while (fr.hasMore) {
          val ftag = fr.readTag()
          if (ftag == ((1 << 3) | WIRE_LEN)) { // map entry
            val (es, ee) = fr.readRegion()
            val er = new ProtoReader(payload, es, ee)
            var key: String = null
            var vs = -1; var ve = -1
            while (er.hasMore) {
              val etag = er.readTag()
              if (etag == ((1 << 3) | WIRE_LEN)) {
                val (ks, ke) = er.readRegion()
                key = new String(payload, ks, ke - ks, java.nio.charset.StandardCharsets.UTF_8)
              } else if (etag == ((2 << 3) | WIRE_LEN)) {
                val (s, e) = er.readRegion(); vs = s; ve = e
              } else er.skipField(etag)
            }
            if (key != null && vs >= 0) f(key, (vs, ve))
          } else fr.skipField(ftag)
        }
      } else r.skipField(tag)
    }
  }

  /** Decode: returns the Feature regions of the REQUIRED keys only.
    * Result array is positional over `required`; null = absent feature.
    * A DUPLICATED key keeps the LAST occurrence — protobuf map
    * semantics (and what TF's own parser does).
    */
  def decodeRegions(payload: Array[Byte], required: Array[String]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](required.length)
    foreachFeature(payload) { (key, region) =>
      var i = 0
      while (i < required.length) {
        if (required(i) == key) out(i) = region
        i += 1
      }
    }
    out
  }

  /** Decode one Feature region into a typed list. Accepts BOTH packed
    * and unpacked repeated encodings for the numeric lists.
    */
  def decodeFeature(payload: Array[Byte], region: (Int, Int)): FeatureValue = {
    val r = new ProtoReader(payload, region._1, region._2)
    var result: FeatureValue = null
    while (r.hasMore) {
      val tag = r.readTag()
      (tag >>> 3, tag & 7) match {
        case (1, WIRE_LEN) => // BytesList
          val (s, e) = r.readRegion()
          val lr = new ProtoReader(payload, s, e)
          val items = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          while (lr.hasMore) {
            val t = lr.readTag()
            if (t == ((1 << 3) | WIRE_LEN)) {
              val (bs, be) = lr.readRegion()
              items += java.util.Arrays.copyOfRange(payload, bs, be)
            } else lr.skipField(t)
          }
          result = Bytes(items.toArray)
        case (2, WIRE_LEN) => // FloatList
          val (s, e) = r.readRegion()
          val lr = new ProtoReader(payload, s, e)
          val items = scala.collection.mutable.ArrayBuffer.empty[Float]
          while (lr.hasMore) {
            val t = lr.readTag()
            if (t == ((1 << 3) | WIRE_LEN)) { // packed
              val (ps, pe) = lr.readRegion()
              val pr = new ProtoReader(payload, ps, pe)
              while (pr.hasMore) items += pr.readFloatLE()
            } else if (t == ((1 << 3) | WIRE_I32)) { // unpacked
              items += lr.readFloatLE()
            } else lr.skipField(t)
          }
          result = F32s(items.toArray)
        case (3, WIRE_LEN) => // Int64List
          val (s, e) = r.readRegion()
          val lr = new ProtoReader(payload, s, e)
          val items = scala.collection.mutable.ArrayBuffer.empty[Long]
          while (lr.hasMore) {
            val t = lr.readTag()
            if (t == ((1 << 3) | WIRE_LEN)) { // packed
              val (ps, pe) = lr.readRegion()
              val pr = new ProtoReader(payload, ps, pe)
              while (pr.hasMore) items += pr.readVarint()
            } else if (t == ((1 << 3) | WIRE_VARINT)) { // unpacked
              items += lr.readVarint()
            } else lr.skipField(t)
          }
          result = I64s(items.toArray)
        case _ => r.skipField(tag)
      }
    }
    result
  }
}

private[sources] object TfRecordTypes {
  /** Columns a tf.Example can carry; anything else fails at PLAN time. */
  def validate(schema: StructType, context: String): Unit = schema.fields.foreach { f =>
    val ok = f.dataType match {
      case LongType | IntegerType | BooleanType | FloatType | DoubleType |
           StringType | BinaryType => true
      case ArrayType(LongType | IntegerType | FloatType | DoubleType |
                     StringType | BinaryType, _) => true
      case _ => false
    }
    if (!ok) throw new IllegalArgumentException(
      s"graft-tfrecord $context: column '${f.name}' has unsupported type " +
        s"${f.dataType.simpleString} — tf.Example carries int64/float/bytes " +
        "lists: long/int/boolean, float/double, string/binary, and arrays thereof")
  }

  def toCatalyst(v: TfExample.FeatureValue, dt: DataType, file: String,
                 feature: String): Any = {
    def scalarLen(n: Int): Unit = if (n != 1) throw new IllegalArgumentException(
      s"graft-tfrecord: feature '$feature' in $file has $n values but the " +
        s"required type ${dt.simpleString} is scalar — declare an array type " +
        "or fix the writer")
    // int64 → int narrows only when the VALUE fits: the format carries
    // int64; a silently truncated id is the quiet-corruption failure
    // mode every other mismatch in this source throws on
    def toIntChecked(x: Long): Int = {
      if (x < Int.MinValue || x > Int.MaxValue) throw new IllegalArgumentException(
        s"graft-tfrecord: feature '$feature' in $file carries int64 value $x " +
          "outside int range — declare LongType")
      x.toInt
    }
    (v, dt) match {
      case (TfExample.I64s(a), LongType) => scalarLen(a.length); a(0)
      case (TfExample.I64s(a), IntegerType) => scalarLen(a.length); toIntChecked(a(0))
      case (TfExample.I64s(a), BooleanType) => scalarLen(a.length); a(0) != 0L
      case (TfExample.F32s(a), FloatType) => scalarLen(a.length); a(0)
      case (TfExample.F32s(a), DoubleType) => scalarLen(a.length); a(0).toDouble
      case (TfExample.Bytes(a), BinaryType) => scalarLen(a.length); a(0)
      case (TfExample.Bytes(a), StringType) =>
        scalarLen(a.length); UTF8String.fromBytes(a(0))
      case (TfExample.I64s(a), ArrayType(LongType, _)) => new GenericArrayData(a)
      case (TfExample.I64s(a), ArrayType(IntegerType, _)) =>
        new GenericArrayData(a.map(toIntChecked))
      case (TfExample.F32s(a), ArrayType(FloatType, _)) => new GenericArrayData(a)
      case (TfExample.F32s(a), ArrayType(DoubleType, _)) =>
        new GenericArrayData(a.map(_.toDouble))
      case (TfExample.Bytes(a), ArrayType(BinaryType, _)) => new GenericArrayData(a)
      case (TfExample.Bytes(a), ArrayType(StringType, _)) =>
        new GenericArrayData(a.map(b => UTF8String.fromBytes(b): Any))
      case _ => throw new IllegalArgumentException(
        s"graft-tfrecord: feature '$feature' in $file is a " +
          s"${v.getClass.getSimpleName} but the required type is ${dt.simpleString}")
    }
  }

  /** Row column → wire feature value; null column → null (absent). */
  def fromCatalyst(row: InternalRow, i: Int, f: StructField): TfExample.FeatureValue = {
    if (row.isNullAt(i)) return null
    def nonEmpty(a: ArrayData): ArrayData = {
      if (a.numElements() == 0) throw new IllegalArgumentException(
        s"graft-tfrecord: column '${f.name}' carries an EMPTY array — the wire " +
          "format cannot distinguish empty from absent (null); filter or null " +
          "these rows explicitly")
      a
    }
    f.dataType match {
      case LongType => TfExample.I64s(Array(row.getLong(i)))
      case IntegerType => TfExample.I64s(Array(row.getInt(i).toLong))
      case BooleanType => TfExample.I64s(Array(if (row.getBoolean(i)) 1L else 0L))
      case FloatType => TfExample.F32s(Array(row.getFloat(i)))
      case DoubleType => TfExample.F32s(Array(row.getDouble(i).toFloat))
      case StringType => TfExample.Bytes(Array(row.getUTF8String(i).getBytes))
      case BinaryType => TfExample.Bytes(Array(row.getBinary(i)))
      case ArrayType(LongType, _) => TfExample.I64s(nonEmpty(row.getArray(i)).toLongArray())
      case ArrayType(IntegerType, _) =>
        TfExample.I64s(nonEmpty(row.getArray(i)).toIntArray().map(_.toLong))
      case ArrayType(FloatType, _) => TfExample.F32s(nonEmpty(row.getArray(i)).toFloatArray())
      case ArrayType(DoubleType, _) =>
        TfExample.F32s(nonEmpty(row.getArray(i)).toDoubleArray().map(_.toFloat))
      case ArrayType(StringType, _) =>
        val a = nonEmpty(row.getArray(i))
        TfExample.Bytes(Array.tabulate(a.numElements())(j => a.getUTF8String(j).getBytes))
      case ArrayType(BinaryType, _) =>
        val a = nonEmpty(row.getArray(i))
        TfExample.Bytes(Array.tabulate(a.numElements())(j => a.getBinary(j)))
      case other => throw new IllegalArgumentException(
        s"graft-tfrecord: unsupported write type ${other.simpleString}") // validate() guards
    }
  }
}

/** File-name contract shared by reader, writer and commit: data files
  * are `*.tfrecord` (raw framing) or `*.tfrecord.gz` (whole-file GZIP —
  * TF's own record-reader compression option; the framing inside is
  * identical). Compression is per-FILE, chosen at write time via
  * `option("compression", "gzip")`; a directory may mix both and the
  * reader dispatches on suffix.
  */
private[graft] object TfRecordFiles { // graft-wide: the streaming sink shares the suffix rule
  def isData(name: String): Boolean =
    name.endsWith(".tfrecord") || name.endsWith(".tfrecord.gz")

  def suffix(codec: String): String = codec match {
    case "none" => ".tfrecord"
    case "gzip" => ".tfrecord.gz"
    case other => throw new IllegalArgumentException(
      s"graft-tfrecord: unsupported compression '$other' — use none or gzip")
  }

  /** Suffix-dispatched GZIP wrap. The raw stream is CLOSED if the gzip
    * header is corrupt (the constructor reads and validates it) —
    * otherwise every failed task attempt leaks an open fd/connection.
    */
  def openMaybeGz(raw: java.io.InputStream, name: String): java.io.InputStream =
    if (!name.endsWith(".gz")) raw
    else try new java.util.zip.GZIPInputStream(raw, 1 << 16)
    catch { case e: Throwable => raw.close(); throw e }

  def codecOf(options: CaseInsensitiveStringMap): String = {
    // Locale.ROOT: a tr-TR default locale lowercases "GZIP" to a
    // dotless-i non-match
    val c = Option(options.get("compression")).getOrElse("none")
      .toLowerCase(java.util.Locale.ROOT)
    suffix(c) // validate loudly at plan time
    c
  }
}

class GraftTfRecord extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tfrecord"
  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-tfrecord requires a path")
    p
  }

  /** Inference = decode ONE record of the first file — never a data
    * scan. int64 → long, float → float, bytes → binary; list length
    * != 1 → array. A user schema (supportsExternalMetadata) overrides.
    */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = AvroHadoop.sessionConf()
    val dir = new Path(pathOf(options))
    val fs = dir.getFileSystem(conf)
    val first = fs.listStatus(dir).filter(st => TfRecordFiles.isData(st.getPath.getName))
      .sortBy(_.getPath.getName).headOption
      .getOrElse(throw new IllegalArgumentException(s"no .tfrecord files under $dir"))
    val in = new java.io.BufferedInputStream(
      TfRecordFiles.openMaybeGz(fs.open(first.getPath), first.getPath.getName))
    try {
      val payload = TfRecordFraming.readRecord(in, first.getPath.toString, 0L)
      if (payload == null)
        throw new IllegalArgumentException(
          s"graft-tfrecord: ${first.getPath} is empty — supply a schema explicitly")
      // a full decode of one record: collect every feature name + shape
      // (the shared walker keeps this in lockstep with row decoding —
      // duplicate keys land last-wins here too via LinkedHashMap update)
      val names = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
      TfExample.foreachFeature(payload) { (key, region) =>
        val (elem, n) = TfExample.decodeFeature(payload, region) match {
          case TfExample.I64s(a) => (LongType: DataType, a.length)
          case TfExample.F32s(a) => (FloatType: DataType, a.length)
          case TfExample.Bytes(a) => (BinaryType: DataType, a.length)
          case null => (NullType: DataType, -1)
        }
        if (n >= 0)
          names += key -> (if (n == 1) elem else ArrayType(elem, containsNull = false))
      }
      if (names.isEmpty) throw new IllegalArgumentException(
        s"graft-tfrecord: first record of ${first.getPath} carries no features")
      StructType(names.map { case (n, dt) => StructField(n, dt, nullable = true) }.toSeq)
    } finally in.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new TfRecordTable(schema, properties.get("path"))
}

class TfRecordTable(tableSchema: StructType, path: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-tfrecord:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Set.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TfRecordScanBuilder(tableSchema, path,
      Option(options.get("maxFilesPerTrigger")).map(_.toInt),
      Option(options.get("offsetCompactionThreshold")).map(_.toInt).getOrElse(4096))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    TfRecordTypes.validate(info.schema(), "write") // fail at plan time, not per task
    new TfRecordWriteBuilder(info.schema(), path, info.queryId(),
      truncate = false, codec = TfRecordFiles.codecOf(info.options()))
  }
}

class TfRecordScanBuilder(full: StructType, path: String,
                          maxFilesPerTrigger: Option[Int] = None,
                          compactionThreshold: Int = 4096)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = {
    TfRecordTypes.validate(required, "read")
    new TfRecordScan(required, path, maxFilesPerTrigger, compactionThreshold)
  }
}

/** One partition = one whole file: TFRecord has no sync markers, so a
  * byte range is not independently decodable — the file count IS the
  * read parallelism (the format's own contract; size shards upstream).
  */
case class TfRecordInputPartition(file: String) extends InputPartition

class TfRecordScan(required: StructType, path: String,
                   maxFilesPerTrigger: Option[Int] = None,
                   compactionThreshold: Int = 4096) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new TfRecordMicroBatchStream(required, path, maxFilesPerTrigger,
      checkpointLocation, compactionThreshold)
  override def description(): String =
    s"graft-tfrecord $path ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = AvroHadoop.sessionConf()
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir).filter(st => TfRecordFiles.isData(st.getPath.getName))
      .sortBy(_.getPath.getName)
      .map(st => TfRecordInputPartition(st.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TfRecordReaderFactory(required.json, AvroHadoop.toMap(AvroHadoop.sessionConf()))
}

class TfRecordReaderFactory(requiredJson: String, confMap: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TfRecordInputPartition]
    val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
    new TfRecordPartitionReader(p.file, required, AvroHadoop.fromMap(confMap))
  }
}

class TfRecordPartitionReader(file: String, required: StructType,
                              conf: Configuration) extends PartitionReader[InternalRow] {
  private val in = new java.io.BufferedInputStream(
    TfRecordFiles.openMaybeGz(
      new Path(file).getFileSystem(conf).open(new Path(file)), file), 1 << 16)
  private val names = required.fieldNames
  private val types = required.fields.map(_.dataType)
  private var offset = 0L
  private var payload: Array[Byte] = _

  override def next(): Boolean = {
    payload = TfRecordFraming.readRecord(in, file, offset)
    if (payload != null) { offset += TfRecordFraming.framedSize(payload.length); true }
    else false
  }

  override def get(): InternalRow = {
    // count(*)-style empty projection: rows exist, no feature decodes
    if (names.isEmpty) return new GenericInternalRow(0)
    val regions = TfExample.decodeRegions(payload, names)
    val arr = new Array[Any](names.length)
    var i = 0
    while (i < names.length) {
      if (regions(i) != null)
        arr(i) = TfRecordTypes.toCatalyst(
          TfExample.decodeFeature(payload, regions(i)), types(i), file, names(i))
      i += 1
    }
    new GenericInternalRow(arr)
  }

  override def close(): Unit = in.close()
}

class TfRecordWriteBuilder(schema: StructType, path: String, queryId: String,
                           truncate: Boolean, codec: String)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new TfRecordWriteBuilder(schema, path, queryId, truncate = true, codec)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new TfRecordBatchWrite(schema, path, queryId, truncate, codec)
  }
}

/** Same task-output protocol as graft-avro (Avro.scala:469-474): every
  * attempt streams into a staged `….tfrecord.inprogress` (invisible to
  * readers) and renames inside DataWriter.commit(), which the commit
  * coordinator grants to exactly one attempt — zombies never publish.
  */
class TfRecordBatchWrite(schema: StructType, path: String, queryId: String,
                         truncate: Boolean, codec: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(AvroHadoop.sessionConf())
    if (!fs.exists(dir)) fs.mkdirs(dir)
    new TfRecordWriterFactory(schema.json, path, queryId, codec,
      AvroHadoop.toMap(AvroHadoop.sessionConf()))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    StagedCommit.jobCommit(path, queryId, truncate, TfRecordFiles.isData)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    StagedCommit.jobAbort(path, queryId)
}

case class TfRecordCommit(file: String, rows: Long) extends WriterCommitMessage

class TfRecordWriterFactory(schemaJson: String, path: String, queryId: String,
                            codec: String,
                            confMap: Map[String, String]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    new TfRecordDataWriter(schema, path, queryId, partitionId, taskId, codec,
      AvroHadoop.fromMap(confMap))
  }
}

class TfRecordDataWriter(schema: StructType, path: String, queryId: String,
                         partitionId: Int, taskId: Long, codec: String,
                         conf: Configuration) extends DataWriter[InternalRow] {
  private val finalFile = new Path(path,
    f"part-$partitionId%05d-$queryId-$taskId${TfRecordFiles.suffix(codec)}")
  private val stagedFile = new Path(path, finalFile.getName + ".inprogress")
  private val fs = stagedFile.getFileSystem(conf)
  private val out = new java.io.BufferedOutputStream({
    val raw: java.io.OutputStream = fs.create(stagedFile, false)
    if (codec == "gzip") new java.util.zip.GZIPOutputStream(raw, 1 << 16)
    else raw
  }, 1 << 16)
  // key bytes encoded ONCE per task, not per row; the encoder and the
  // value slots are task-lifetime too (per-row cost = the values only)
  private val keys = schema.fieldNames.map(
    _.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private val fields = schema.fields
  private val enc = new TfExample.TfExampleEncoder
  private val values = new Array[TfExample.FeatureValue](fields.length)
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    var i = 0
    while (i < fields.length) {
      values(i) = TfRecordTypes.fromCatalyst(row, i, fields(i))
      i += 1
    }
    TfRecordFraming.writeRecord(out, enc.encode(keys, values))
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    if (!fs.rename(stagedFile, finalFile))
      throw new java.io.IOException(
        s"graft-tfrecord: rename $stagedFile -> $finalFile failed")
    TfRecordCommit(finalFile.toString, rows)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: java.io.IOException => () }
    if (fs.exists(stagedFile)) fs.delete(stagedFile, false)
  }

  override def close(): Unit = ()
}

/** The tfrecord instantiation of the shared shard-directory stream
  * machinery ([[FileSetMicroBatchStream]] — file-name-set offsets,
  * content-addressed compaction past `compactionThreshold`,
  * reachability-ring snapshot GC, `maxFilesPerTrigger` admission,
  * AvailableNow listing freeze). The seen-set subdir keeps its
  * historical `graft-tfrecord-seen` name so checkpoints written before
  * the round-12 factoring keep resolving.
  */
class TfRecordMicroBatchStream(required: StructType, path: String,
                               maxFilesPerTrigger: Option[Int],
                               checkpointLocation: String = "",
                               compactionThreshold: Int = 4096)
    extends FileSetMicroBatchStream(
      path, maxFilesPerTrigger, checkpointLocation, compactionThreshold,
      formatName = "graft-tfrecord", seenDirName = "graft-tfrecord-seen",
      isData = TfRecordFiles.isData,
      makePartition = f => TfRecordInputPartition(f),
      factory = () => new TfRecordReaderFactory(required.json,
        AvroHadoop.toMap(AvroHadoop.sessionConf())))

/** The §2e gate query for `graft-tfrecord`: write a typed lineitem
  * slice as TFRecord shards, read it back, and report a content census
  * FROM THE READ-BACK; the oracle computes the identical census over
  * the ORIGINAL parquet — a hash match proves the wire format preserved
  * every value. Census covers the full type surface the format carries:
  * int64 (long + int + bool), float32 (exact small integers, so the
  * float round-trip is bit-exact by construction), bytes (string +
  * binary), and int64/float32 LISTS. Temporals travel as strings (the
  * format has no temporal type — the documented convention).
  */
object TfRecordQueries {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  def srcTfRecordRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"),
        // l_quantity is integer-valued (TPC-H 1..50): float32 is exact
        col("l_quantity").cast("float").as("l_qty"),
        col("l_returnflag"),
        date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("l_ship"),
        (col("l_returnflag") === "R").as("l_returned"),
        encode(col("l_returnflag"), "UTF-8").as("l_flagbin"),
        array(col("l_orderkey"), col("l_linenumber").cast("long")).as("keys"),
        array(col("l_quantity").cast("float"),
          (col("l_quantity") + lit(1.0)).cast("float")).as("vec"))
    val dir = java.nio.file.Files.createTempDirectory("graft-tfr-rt-")
    try {
      // shard = file = read partition: size the shard count to the
      // cluster's parallelism (the format's own knob — an inherited
      // input partitioning would cap the read-back at the SOURCE's
      // file count, which is what a 100 TB export must not do)
      df.repartition(spark.sparkContext.defaultParallelism)
        .write.format("graft-tfrecord").mode("append").save(dir.toString)
      val census = spark.read.format("graft-tfrecord").schema(df.schema)
        .load(dir.toString).agg(
          count(lit(1)).as("n_rows"),
          sum("l_orderkey").as("sum_orderkey"),
          sum(col("l_linenumber").cast("long")).as("sum_linenumber"),
          sum(floor(col("l_qty").cast("double") * 100 + 0.5)).as("qty_cents"),
          countDistinct("l_returnflag").as("n_flags"),
          sum(when(col("l_returned"), 1L).otherwise(0L)).as("n_returned"),
          sum(length(col("l_flagbin")).cast("long")).as("bin_bytes"),
          min("l_ship").as("min_ship"),
          max("l_ship").as("max_ship"),
          // list censuses: every element reaches the aggregate
          sum(element_at(col("keys"), 1) + element_at(col("keys"), 2))
            .as("keys_sum"),
          sum(floor(element_at(col("vec"), 1).cast("double") * 100 + 0.5) +
            floor(element_at(col("vec"), 2).cast("double") * 100 + 0.5))
            .as("vec_cents"))
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(census.collect().toSeq.asJava, census.schema)
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  /** The identical census over the ORIGINAL table. */
  val oracleSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(l_orderkey) AS BIGINT) AS sum_orderkey,
      |  CAST(sum(l_linenumber) AS BIGINT) AS sum_linenumber,
      |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_cents,
      |  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_flags,
      |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
      |  CAST(sum(octet_length(encode(l_returnflag))) AS BIGINT) AS bin_bytes,
      |  strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_ship,
      |  strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_ship,
      |  CAST(sum(l_orderkey + l_linenumber) AS BIGINT) AS keys_sum,
      |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
      |        + CAST(floor((l_quantity + 1.0) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS vec_cents
      |FROM lineitem""".stripMargin
}
