package graft.sources


import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => AvroSchema}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Avro container-file source/sink (SURVEY.md §2e) as a DataSource V2
  * `TableProvider` — the `spark-avro` module is absent from this
  * environment's jars, but Avro CORE (`avro`, `avro-mapred`) is on the
  * Spark classpath, so the interchange format is implemented against
  * the PUBLIC connector API instead of being declared blocked. This is
  * also the repo's demonstration of the V2 extension surface itself:
  * a table provider with schema inference, COLUMN PRUNING pushed into
  * the decoder, SPLIT reads, and an executor-side distributed writer.
  *
  * Scale design, the three things that matter at 100 TB:
  *   - SPLITTABLE READS: Avro container files interleave sync markers;
  *     a partition is a (file, start, length) byte range — the reader
  *     seeks to the first sync past `start` and drains blocks until
  *     past `start+length` (the classic avro-mapred split protocol),
  *     so one 10 GB file fans out across executors instead of pinning
  *     one task. Split size follows `spark.sql.files.maxPartitionBytes`.
  *   - PRUNING IN THE DECODER: `SupportsPushDownRequiredColumns`
  *     narrows the READER schema; Avro schema resolution then SKIPS
  *     non-projected fields during decode (row formats can't skip I/O
  *     like parquet, but they can skip deserialization — the analog of
  *     ReadSchema pruning, visible in the scan's readSchema).
  *   - DISTRIBUTED WRITES: each task streams its partition through a
  *     `DataFileWriter` straight to the target FS (no driver funnel);
  *     files carry the query UUID, so `overwrite` (SupportsTruncate)
  *     commits by deleting exactly the files of PREVIOUS queries and
  *     their STAGING residue — a crashed job's leftovers are swept
  *     whole, never half-deleted. Concurrent COMMITTED writers racing
  *     a truncate-overwrite are unsupported (same contract as Spark's
  *     built-in file sources): an append that commits between the
  *     truncate's listing and its deletes can lose its files.
  *
  * Type surface (the graft tables' columns): boolean, int, long,
  * float, double, string, binary, date (int/`date`), timestamp
  * (long/`timestamp-micros`), timestamp_ntz (long/
  * `local-timestamp-micros`), decimal (bytes/`decimal(p,s)` —
  * unscaled two's-complement big-endian, the Avro spec encoding every
  * CDC feed carries), and NESTED RECORDS (struct columns, recursively,
  * round-tripped whole — top-level pruning skips a non-projected
  * nested column's decode entirely; field selection INSIDE a projected
  * struct is resolved by name at decode, so a nested-pruned required
  * schema still reads correctly); nullable = union(null, T) at every
  * level. Arrays/maps remain out of scope and fail loudly at schema
  * conversion.
  */
object AvroConversions {

  def toAvro(struct: StructType, recordName: String): AvroSchema = {
    val fields = struct.fields.map { f =>
      val base = f.dataType match {
        case BooleanType => AvroSchema.create(AvroSchema.Type.BOOLEAN)
        case IntegerType => AvroSchema.create(AvroSchema.Type.INT)
        case LongType => AvroSchema.create(AvroSchema.Type.LONG)
        case FloatType => AvroSchema.create(AvroSchema.Type.FLOAT)
        case DoubleType => AvroSchema.create(AvroSchema.Type.DOUBLE)
        case StringType => AvroSchema.create(AvroSchema.Type.STRING)
        case BinaryType => AvroSchema.create(AvroSchema.Type.BYTES)
        case DateType =>
          LogicalTypes.date().addToSchema(AvroSchema.create(AvroSchema.Type.INT))
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(AvroSchema.create(AvroSchema.Type.LONG))
        case TimestampNTZType =>
          LogicalTypes.localTimestampMicros().addToSchema(AvroSchema.create(AvroSchema.Type.LONG))
        case d: DecimalType =>
          LogicalTypes.decimal(d.precision, d.scale)
            .addToSchema(AvroSchema.create(AvroSchema.Type.BYTES))
        case st: StructType =>
          // record names must be unique within one schema — qualify by path
          toAvro(st, s"${recordName}_${f.name}")
        case other =>
          throw new IllegalArgumentException(
            s"graft-avro does not map Spark type $other (field ${f.name})")
      }
      val t = if (f.nullable)
        AvroSchema.createUnion(java.util.List.of(AvroSchema.create(AvroSchema.Type.NULL), base))
      else base
      new AvroSchema.Field(f.name, t, null, null)
    }
    AvroSchema.createRecord(recordName, null, "graft", false, fields.toList.asJava)
  }

  def toSpark(schema: AvroSchema): StructType = {
    def field(s: AvroSchema): (DataType, Boolean) = s.getType match {
      case AvroSchema.Type.UNION =>
        val branches = s.getTypes.asScala
        val nonNull = branches.filter(_.getType != AvroSchema.Type.NULL)
        if (nonNull.size != 1)
          throw new IllegalArgumentException(s"graft-avro: unsupported union $s")
        (field(nonNull.head)._1, branches.size != nonNull.size)
      case AvroSchema.Type.BOOLEAN => (BooleanType, false)
      case AvroSchema.Type.INT =>
        if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) (DateType, false)
        else (IntegerType, false)
      case AvroSchema.Type.LONG =>
        s.getLogicalType match {
          case _: LogicalTypes.TimestampMicros => (TimestampType, false)
          case _: LogicalTypes.LocalTimestampMicros => (TimestampNTZType, false)
          case _ => (LongType, false)
        }
      case AvroSchema.Type.FLOAT => (FloatType, false)
      case AvroSchema.Type.DOUBLE => (DoubleType, false)
      case AvroSchema.Type.STRING => (StringType, false)
      case AvroSchema.Type.BYTES =>
        s.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            (DecimalType(d.getPrecision, d.getScale), false)
          case _ => (BinaryType, false)
        }
      case AvroSchema.Type.RECORD => (toSpark(s), false)
      case other => throw new IllegalArgumentException(s"graft-avro: unsupported Avro type $other")
    }
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = field(f.schema())
      StructField(f.name(), dt, nullable)
    }.toArray)
  }

  /** The non-null branch of a union(null, T) field schema (T itself
    * when the field is non-nullable).
    */
  def nonNullBranch(s: AvroSchema): AvroSchema =
    if (s.getType == AvroSchema.Type.UNION)
      s.getTypes.asScala.find(_.getType != AvroSchema.Type.NULL)
        .getOrElse(throw new IllegalArgumentException(s"graft-avro: all-null union $s"))
    else s

  /** Avro datum → Catalyst value for one Spark type. */
  def toCatalyst(v: Any, dt: DataType): Any = v match {
    case null => null
    case _ => dt match {
      case StringType => UTF8String.fromString(v.toString)
      case d: DecimalType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out)
        org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(new java.math.BigInteger(out), d.scale),
          d.precision, d.scale)
      case st: StructType =>
        // nested fields resolve BY NAME against the record's own schema:
        // Spark's required schema may carry a nested-pruned or reordered
        // struct, so positional mapping against the file layout would
        // transpose values
        val rec = v.asInstanceOf[GenericRecord]
        val recSchema = rec.getSchema
        new GenericInternalRow(st.fields.map { f =>
          val rf = recSchema.getField(f.name)
          if (rf == null) throw new IllegalArgumentException(
            s"graft-avro: nested field ${f.name} absent from record ${recSchema.getName}")
          toCatalyst(rec.get(rf.pos()), f.dataType)
        }.asInstanceOf[Array[Any]])
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
      // Avro numeric promotions (legal per schema resolution): the
      // datum still carries the WRITER's width, so widen here. The
      // match-on-value keeps the already-wide common case a no-op.
      case LongType => v match {
        case i: java.lang.Integer => i.longValue(); case other => other
      }
      case FloatType => v match {
        case i: java.lang.Integer => i.floatValue()
        case l: java.lang.Long => l.floatValue(); case other => other
      }
      case DoubleType => v match {
        case i: java.lang.Integer => i.doubleValue()
        case l: java.lang.Long => l.doubleValue()
        case f: java.lang.Float => f.doubleValue(); case other => other
      }
      case _ => v // int/boolean/date-int/ts-long pass through
    }
  }

  /** Catalyst value → Avro datum for one Spark type. `fieldSchema` is
    * the field's NON-NULL Avro schema — needed to construct nested
    * records and kept alongside the Spark type for every level.
    */
  def toAvroDatum(row: InternalRow, i: Int, dt: DataType,
                  fieldSchema: AvroSchema): Any =
    if (row.isNullAt(i)) null
    else dt match {
      case BooleanType => row.getBoolean(i)
      case IntegerType | DateType => row.getInt(i)
      case LongType | TimestampType | TimestampNTZType => row.getLong(i)
      case FloatType => row.getFloat(i)
      case DoubleType => row.getDouble(i)
      case StringType => row.getUTF8String(i).toString
      case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
      case d: DecimalType =>
        // Avro decimal encoding: the unscaled value's two's-complement
        // big-endian bytes; the scale lives in the schema
        java.nio.ByteBuffer.wrap(row.getDecimal(i, d.precision, d.scale)
          .toJavaBigDecimal.unscaledValue().toByteArray)
      case st: StructType =>
        val nested = row.getStruct(i, st.size)
        val rec = new GenericData.Record(fieldSchema)
        st.fields.zipWithIndex.foreach { case (f, j) =>
          rec.put(j, toAvroDatum(nested, j, f.dataType,
            nonNullBranch(fieldSchema.getFields.get(j).schema())))
        }
        rec
      case other => throw new IllegalArgumentException(s"graft-avro: $other")
    }
}

/** Hadoop configuration plumbing: the SESSION's conf (credentials,
  * fs.defaultFS, s3a settings …) must reach every FS access — a bare
  * `new Configuration()` only works on local file:// paths. Driver
  * sides call [[sessionConf]]; factories ship the flattened entries to
  * executors as a plain Map (Hadoop's Configuration isn't
  * Java-serializable and Spark's SerializableConfiguration is
  * private[spark]).
  */
private[sources] object AvroHadoop {
  def sessionConf(): Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  def toMap(conf: Configuration): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    conf.iterator().forEachRemaining(e => b += e.getKey -> e.getValue)
    b.result()
  }

  def fromMap(m: Map[String, String]): Configuration = {
    val c = new Configuration(false)
    m.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

/** The correctness-gate query over the source: round-trip a typed
  * lineitem slice (long/int/double/string/timestamp/date/boolean/
  * binary) through graft-avro and report a content census computed
  * FROM THE READ-BACK — the DuckDB oracle computes the identical
  * census from the ORIGINAL parquet, so a hash match proves the
  * round-trip preserved content, not just row counts. Doubles cross
  * the engines as exact integer cents (floor(v·100+½) — never a
  * float sum, whose order-dependence breaks hashes); timestamps and
  * dates as formatted strings (engine serialization differences can't
  * touch the hash). The temp tree is deleted before returning (the
  * corpus_shuffle_write discipline — the census is ONE row).
  */
object AvroQueries {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  def srcAvroRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"), col("l_shipdate"),
        to_date(col("l_shipdate")).as("l_shipday"),
        (col("l_returnflag") === "R").as("l_returned"),
        encode(col("l_returnflag"), "UTF-8").as("l_flagbin"),
        // round-11: the two most common real-estate payload shapes —
        // an exact decimal (every CDC feed) and a nested record
        col("l_quantity").cast("decimal(12,2)").as("l_qty_dec"),
        struct(col("l_returnflag").as("flag"),
          col("l_linenumber").as("ln")).as("l_nest"))
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-rt-")
    try {
      df.write.format("graft-avro").mode("append").save(dir.toString)
      val census = spark.read.format("graft-avro").load(dir.toString).agg(
        count(lit(1)).as("n_rows"),
        sum("l_orderkey").as("sum_orderkey"),
        sum(col("l_linenumber").cast("long")).as("sum_linenumber"),
        sum(floor(col("l_quantity") * 100 + 0.5)).as("qty_cents"),
        countDistinct("l_returnflag").as("n_flags"),
        sum(when(col("l_returned"), 1L).otherwise(0L)).as("n_returned"),
        sum(length(col("l_flagbin")).cast("long")).as("bin_bytes"),
        date_format(min("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("min_ship"),
        date_format(max("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("max_ship"),
        min(col("l_shipday")).cast("string").as("min_day"),
        max(col("l_shipday")).cast("string").as("max_day"),
        // decimal census as a STRING: Spark's sum(decimal(12,2)) widens
        // to (22,2), DuckDB's to (38,2) — the scale-2 digits are the
        // contract, the precision headroom is not
        sum(col("l_qty_dec")).cast("string").as("dec_total"),
        // nested-record census read back THROUGH the struct column
        sum(col("l_nest.ln").cast("long")).as("nest_ln_sum"),
        countDistinct(col("l_nest.flag")).as("nest_flags"))
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
      |  CAST(CAST(min(l_shipdate) AS DATE) AS VARCHAR) AS min_day,
      |  CAST(CAST(max(l_shipdate) AS DATE) AS VARCHAR) AS max_day,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS dec_total,
      |  CAST(sum(l_linenumber) AS BIGINT) AS nest_ln_sum,
      |  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS nest_flags
      |FROM lineitem""".stripMargin
}

class GraftAvro extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-avro requires a path")
    p
  }

  /** Schema inference = read ONE file header (Avro files carry their
    * writer schema) — never a data scan.
    */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = AvroHadoop.sessionConf()
    val dir = new Path(pathOf(options))
    val fs = dir.getFileSystem(conf)
    val first = fs.listStatus(dir).filter(_.getPath.getName.endsWith(".avro"))
      .sortBy(_.getPath.getName).headOption
      .getOrElse(throw new IllegalArgumentException(s"no .avro files under $dir"))
    val in = new FsInput(first.getPath, conf)
    val r = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
    try AvroConversions.toSpark(r.getSchema) finally r.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new AvroTable(schema, properties.get("path"))
}

class AvroTable(tableSchema: StructType, path: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-avro:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Set.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(tableSchema, path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AvroWriteBuilder(info.schema(), path, info.queryId(), truncate = false)
}

class AvroScanBuilder(full: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new AvroScan(full, required, path)
}

/** One split = (file, start, length); the reader syncs past `start`
  * and drains blocks until past the end — two tasks never decode the
  * same block, every block is decoded by exactly one task.
  */
case class AvroInputPartition(file: String, start: Long, length: Long) extends InputPartition

class AvroScan(full: StructType, required: StructType, path: String)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft-avro $path ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = AvroHadoop.sessionConf()
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val splitBytes = org.apache.spark.sql.SparkSession.active.sessionState.conf
      .filesMaxPartitionBytes
    fs.listStatus(dir).filter(_.getPath.getName.endsWith(".avro")).flatMap { st =>
      (0L until st.getLen by splitBytes).map { off =>
        AvroInputPartition(st.getPath.toString, off, math.min(splitBytes, st.getLen - off))
      }
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required.json, AvroHadoop.toMap(AvroHadoop.sessionConf()))
}

class AvroReaderFactory(requiredJson: String, confMap: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AvroInputPartition]
    val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
    new AvroPartitionReader(p, required, AvroHadoop.fromMap(confMap))
  }
}

class AvroPartitionReader(p: AvroInputPartition, required: StructType,
                          conf: Configuration) extends PartitionReader[InternalRow] {
  private val in = new FsInput(new Path(p.file), conf)
  // the READER schema is the pruned one — Avro schema resolution skips
  // the deserialization of every non-projected writer field
  private val (reader, prunedSchema) = {
    val datum = new GenericDatumReader[GenericRecord]()
    val r = DataFileReader.openReader(in, datum)
    val writerStruct = AvroConversions.toSpark(r.getSchema)
    // Validate EVERY required column against this file's writer schema
    // before any positions are resolved: a user-supplied schema
    // (supportsExternalMetadata) or mixed-schema appends into one
    // directory would otherwise surface as a bare NullPointerException
    // from getField(n).pos() naming neither the file nor the column.
    val missing = required.fieldNames.filterNot(writerStruct.fieldNames.contains)
    if (missing.nonEmpty) {
      r.close()
      throw new IllegalArgumentException(
        s"graft-avro: file ${p.file} has no column(s) ${missing.mkString(", ")} " +
          s"(writer schema carries: ${writerStruct.fieldNames.mkString(", ")}) — " +
          "user-supplied schema mismatch, or mixed-schema appends in one directory")
    }
    // ... and against TYPE drift, not just presence: the decode applies
    // the REQUIRED type to the file's bytes, so a decimal read at a
    // different scale than written would SILENTLY rescale every value
    // by a power of ten (other mismatches surface as unlabeled
    // ClassCastExceptions). Nested structs may be pruned to a field
    // subset (by-name resolution handles that); LEAF types must match
    // exactly — EXCEPT Avro's own legal numeric promotions (int→long,
    // int/long→float/double, float→double; Avro spec §Schema
    // Resolution), which schema resolution has always supported and
    // user schemas legitimately rely on (toCatalyst widens the decoded
    // value). Nullability is resolution's job; types are not.
    def compatible(req: DataType, writer: DataType): Boolean = (req, writer) match {
      case (rs: StructType, ws: StructType) =>
        val byName = ws.fields.map(f => f.name -> f.dataType).toMap
        rs.fields.forall(f => byName.get(f.name).exists(compatible(f.dataType, _)))
      case (ra: ArrayType, wa: ArrayType) => compatible(ra.elementType, wa.elementType)
      case (LongType, IntegerType) => true
      case (FloatType, IntegerType | LongType) => true
      case (DoubleType, IntegerType | LongType | FloatType) => true
      case _ => req == writer
    }
    val writerByName = writerStruct.fields.map(f => f.name -> f.dataType).toMap
    required.fields.foreach { f =>
      val w = writerByName(f.name)
      if (!compatible(f.dataType, w)) {
        r.close()
        throw new IllegalArgumentException(
          s"graft-avro: column '${f.name}' in ${p.file} was written as " +
            s"${w.simpleString} but the required schema asks for " +
            s"${f.dataType.simpleString} — read with the written type and cast")
      }
    }
    val pruned = AvroConversions.toAvro(
      writerStruct // writer field nullability, pruned by name
        .fields.filter(f => required.fieldNames.contains(f.name))
        .foldLeft(new StructType())(_ add _), "graft_avro_read")
    datum.setExpected(pruned)
    r.sync(p.start)
    (r, pruned)
  }
  // field positions resolved ONCE — a per-row by-name get() would be a
  // string-keyed schema lookup per (row × column) in the decode loop
  private val positions = required.fieldNames.map(n => prunedSchema.getField(n).pos())
  private val types = required.fields.map(_.dataType)
  private var current: GenericRecord = _

  override def next(): Boolean = {
    if (reader.hasNext && !reader.pastSync(p.start + p.length)) {
      current = reader.next(); true
    } else false
  }

  override def get(): InternalRow = {
    val arr = new Array[Any](positions.length)
    var i = 0
    while (i < positions.length) {
      arr(i) = AvroConversions.toCatalyst(current.get(positions(i)), types(i))
      i += 1
    }
    new GenericInternalRow(arr)
  }

  override def close(): Unit = { reader.close() }
}

class AvroWriteBuilder(schema: StructType, path: String, queryId: String,
                       truncate: Boolean) extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new AvroWriteBuilder(schema, path, queryId, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new AvroBatchWrite(schema, path, queryId, truncate)
  }
}

/** Task output protocol: every attempt streams into a STAGED name
  * (`….avro.inprogress` — invisible to readers, which match only the
  * `.avro` suffix) and RENAMES to the final name inside
  * `DataWriter.commit()`, which Spark's commit coordinator grants to
  * exactly one attempt per task. A zombie or speculatively-killed
  * attempt therefore never contributes a visible file: its staging
  * residue is swept by the driver-side job commit/abort. Without the
  * stage-and-rename, a task that died mid-write would leave a partial
  * `.avro` that a retry cannot distinguish from its own output —
  * duplicate/garbage rows on every subsequent read.
  */
class AvroBatchWrite(schema: StructType, path: String, queryId: String,
                     truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(AvroHadoop.sessionConf())
    if (!fs.exists(dir)) fs.mkdirs(dir)
    new AvroWriterFactory(schema.json, path, queryId,
      AvroHadoop.toMap(AvroHadoop.sessionConf()))
  }

  /** Overwrite semantics: the new files carry this query's UUID; commit
    * deletes exactly the .avro files of previous queries, plus any
    * staging residue this query's dead attempts left behind. Shared
    * protocol: [[StagedCommit]].
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    StagedCommit.jobCommit(path, queryId, truncate, _.endsWith(".avro"))

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    StagedCommit.jobAbort(path, queryId)
}

case class AvroCommit(file: String, rows: Long) extends WriterCommitMessage

class AvroWriterFactory(schemaJson: String, path: String, queryId: String,
                        confMap: Map[String, String]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    new AvroDataWriter(schema, path, queryId, partitionId, taskId,
      AvroHadoop.fromMap(confMap))
  }
}

class AvroDataWriter(schema: StructType, path: String, queryId: String,
                     partitionId: Int, taskId: Long,
                     conf: Configuration) extends DataWriter[InternalRow] {
  private val avroSchema = AvroConversions.toAvro(schema, "graft_avro")
  private val finalFile = new Path(path,
    f"part-$partitionId%05d-$queryId-$taskId.avro")
  private val stagedFile = new Path(path, finalFile.getName + ".inprogress")
  private val fs = stagedFile.getFileSystem(conf)
  private val writer = new DataFileWriter[GenericRecord](
    new GenericDatumWriter[GenericRecord](avroSchema))
    .create(avroSchema, fs.create(stagedFile, false))
  private var rows = 0L

  // per-field non-null Avro schemas resolved ONCE, not per row
  private val fieldSchemas = avroSchema.getFields.asScala
    .map(f => AvroConversions.nonNullBranch(f.schema())).toArray

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(i, AvroConversions.toAvroDatum(row, i, f.dataType, fieldSchemas(i)))
    }
    writer.append(rec)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    if (!fs.rename(stagedFile, finalFile))
      throw new java.io.IOException(s"graft-avro: rename $stagedFile -> $finalFile failed")
    AvroCommit(finalFile.toString, rows)
  }

  override def abort(): Unit = {
    // a broken stream makes close() itself throw — the staged file must
    // still be deleted, so the delete rides a finally
    try writer.close()
    catch { case _: Throwable => () }
    finally fs.delete(stagedFile, false)
    ()
  }

  override def close(): Unit = ()
}
