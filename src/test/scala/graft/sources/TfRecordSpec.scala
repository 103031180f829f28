package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class TfRecordSpec extends SparkSpec {

  // TFRecord's type surface: int64/float32/bytes lists. Dates/timestamps
  // travel as strings; double → float32 is the FORMAT's precision, so the
  // sample pre-casts to float to keep round-trip equality exact.
  private def sample = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .select(col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("float").as("l_qty"),
      col("l_returnflag"), col("l_shipdate").cast("string").as("l_ship"),
      (col("l_returnflag") === "R").as("l_returned"),
      encode(col("l_returnflag"), "UTF-8").as("l_flagbin"),
      array(col("l_orderkey"), col("l_linenumber").cast("long")).as("keys"),
      array(col("l_quantity").cast("float"), lit(0.25f)).as("vec"),
      split(col("l_returnflag"), "").as("toks"))

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-tfr-spec-").toString

  private def rm(dir: String): Unit =
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(dir))

  test("masked CRC32C matches the public test vector " +
    "(crc32c('123456789') = 0xE3069283, TF mask arithmetic)") {
    val b = "123456789".getBytes("UTF-8")
    val c = new java.util.zip.CRC32C
    c.update(b, 0, b.length)
    assert(c.getValue.toInt == 0xE3069283, "JDK CRC32C vs the public vector")
    // mask(0xE3069283) = 0xC78AB0E5 — derived independently (python,
    // uint32 arithmetic); pins the shift/add against sign-extension bugs
    assert(TfRecordFraming.maskedCrc(b, 0, b.length) == 0xC78AB0E5.toInt)
  }

  test("tf.Example encoder emits byte-exact public wire format " +
    "(golden literal derived from the proto spec by hand)") {
    import TfExample._
    val got = encode(Array(
      ("a".getBytes("UTF-8"), I64s(Array(3L, 270L))),
      ("b".getBytes("UTF-8"), Bytes(Array("hi".getBytes("UTF-8")))),
      ("c".getBytes("UTF-8"), F32s(Array(1.5f)))))
    val golden = Array(10, 42, 10, 12, 10, 1, 97, 18, 7, 26, 5, 10, 3, 3,
      142, 2, 10, 11, 10, 1, 98, 18, 6, 10, 4, 10, 2, 104, 105, 10, 13,
      10, 1, 99, 18, 8, 18, 6, 10, 4, 0, 0, 192, 63).map(_.toByte)
    assert(java.util.Arrays.equals(got, golden),
      s"wire drift: got ${got.toSeq} expected ${golden.toSeq}")
  }

  test("decoder accepts UNPACKED repeated numerics (other writers emit " +
    "them; the spec allows both encodings)") {
    import TfExample._
    // hand-build an Example whose int64 list is UNPACKED (tag-per-value,
    // wire type 0) and float list UNPACKED (wire type 5)
    val i64list = new ProtoBuf()
    i64list.writeTag(1, WIRE_VARINT); i64list.writeVarint(7L)
    i64list.writeTag(1, WIRE_VARINT); i64list.writeVarint(300L)
    val featA = new ProtoBuf(); featA.writeMessage(3, i64list)
    val entryA = new ProtoBuf()
    entryA.writeBytesField(1, "a".getBytes("UTF-8"))
    entryA.writeMessage(2, featA)
    val f32list = new ProtoBuf()
    f32list.writeTag(1, WIRE_I32); f32list.writeFloatLE(2.5f)
    val featB = new ProtoBuf(); featB.writeMessage(2, f32list)
    val entryB = new ProtoBuf()
    entryB.writeBytesField(1, "b".getBytes("UTF-8"))
    entryB.writeMessage(2, featB)
    val features = new ProtoBuf()
    features.writeMessage(1, entryA); features.writeMessage(1, entryB)
    val example = new ProtoBuf(); example.writeMessage(1, features)
    val payload = example.toByteArray
    val regions = decodeRegions(payload, Array("a", "b"))
    assert(decodeFeature(payload, regions(0)).asInstanceOf[I64s].v.toSeq ==
      Seq(7L, 300L))
    assert(decodeFeature(payload, regions(1)).asInstanceOf[F32s].v.toSeq ==
      Seq(2.5f))
  }

  test("a CRC-valid but MALFORMED payload fails loudly instead of " +
    "spinning: negative length-delimited skip cannot move pos backwards") {
    // tag field-4/wire-2 followed by varint 4294967290 (toInt = -6):
    // an unchecked skip would rewind to the tag and loop forever
    val evil = Array(0x22, 0xFA, 0xFF, 0xFF, 0xFF, 0x0F).map(_.toByte)
    val e = intercept[java.io.IOException] {
      TfExample.decodeRegions(evil, Array("x"))
    }
    assert(e.getMessage.contains("bad skip length"), e.getMessage)
    // and a huge-positive region length can't overflow the bounds check
    val evil2 = Array(0x0A, 0xFF, 0xFF, 0xFF, 0xFF, 0x07).map(_.toByte)
    intercept[java.io.IOException] { TfExample.decodeRegions(evil2, Array("x")) }
  }

  test("a DUPLICATED feature key resolves last-wins (protobuf map " +
    "semantics — what tf.data loads from the same file)") {
    import TfExample._
    val one = encode(Array(("k".getBytes("UTF-8"), I64s(Array(1L)))))
    val two = encode(Array(("k".getBytes("UTF-8"), I64s(Array(2L)))))
    // splice: Example{features{entry k=1, entry k=2}} — concatenating
    // two Examples' payloads is valid protobuf (repeated merge)
    val spliced = one ++ two
    val r = decodeRegions(spliced, Array("k"))
    assert(decodeFeature(spliced, r(0)).asInstanceOf[I64s].v.toSeq == Seq(2L),
      "last occurrence must win")
  }

  test("int64 → int reads narrow only when the value fits: an " +
    "out-of-range value fails naming the feature, never truncates") {
    val dir = freshDir()
    try {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("id", LongType)))
      val df = spark.createDataFrame(
        java.util.List.of(Row(4294967301L)), schema)
      df.write.format("graft-tfrecord").mode("append").save(dir)
      val narrow = StructType(Seq(StructField("id", IntegerType)))
      val e = intercept[org.apache.spark.SparkException] {
        spark.read.format("graft-tfrecord").schema(narrow).load(dir).collect()
      }
      val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
      assert(msg.contains("4294967301") && msg.contains("outside int range"),
        s"must be loud, not silently 5: $msg")
    } finally rm(dir)
  }

  test("round-trip is content-identical across the whole type surface " +
    "(long/int/float/bool/string/binary + arrays of long/float/string)") {
    val dir = freshDir()
    try {
      val df = sample
      df.write.format("graft-tfrecord").mode("append").save(dir)
      val back = spark.read.format("graft-tfrecord")
        .schema(df.schema).load(dir)
      assert(back.count() == df.count())
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
        "round-trip must preserve every row value-identically")
    } finally rm(dir)
  }

  test("column pruning reaches the scan AND the decoder skips " +
    "non-projected features at the wire level") {
    val dir = freshDir()
    try {
      sample.write.format("graft-tfrecord").mode("append").save(dir)
      val q = spark.read.format("graft-tfrecord").schema(sample.schema)
        .load(dir).select("l_orderkey", "l_returnflag")
      val scans = q.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      assert(scans.nonEmpty, "expected a BatchScan")
      assert(scans.head.scan.readSchema().fieldNames.toSet ==
        Set("l_orderkey", "l_returnflag"),
        s"pruning must reach the decoder: ${scans.head.scan.readSchema()}")
      val expect = sample.select("l_orderkey", "l_returnflag")
      assert(q.exceptAll(expect).isEmpty && expect.exceptAll(q).isEmpty)
    } finally rm(dir)
  }

  test("shard = file: N written shards read back as exactly N partitions " +
    "(the format has no sync markers — file count IS the parallelism)") {
    val dir = freshDir()
    try {
      sample.repartition(4).write.format("graft-tfrecord").mode("append").save(dir)
      val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tfrecord"))
      assert(files.length == 4, s"one file per write task: ${files.length}")
      val back = spark.read.format("graft-tfrecord").schema(sample.schema).load(dir)
      assert(back.rdd.getNumPartitions == 4,
        s"one read partition per file, got ${back.rdd.getNumPartitions}")
      assert(back.count() == sample.count())
    } finally rm(dir)
  }

  test("corruption is LOUD: a flipped payload byte fails naming the file " +
    "and byte offset — never a silent row drop") {
    val dir = freshDir()
    try {
      sample.limit(50).coalesce(1).write.format("graft-tfrecord").mode("append").save(dir)
      val f = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".tfrecord")).head
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      bytes(20) = (bytes(20) ^ 0x7f).toByte // inside the first payload
      java.nio.file.Files.write(f.toPath, bytes)
      // drop Hadoop's local-FS .crc sidecar: on HDFS/S3 it doesn't exist,
      // and the point is the FRAMING CRC catching the flip
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(dir, "." + f.getName + ".crc"))
      val e = intercept[org.apache.spark.SparkException] {
        spark.read.format("graft-tfrecord").schema(sample.schema).load(dir).count()
      }
      val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
      assert(msg.contains("corrupt record") && msg.contains(".tfrecord") &&
        msg.contains("offset"), s"must name file+offset: $msg")
    } finally rm(dir)
  }

  test("a truncated final frame is corruption, not EOF") {
    val dir = freshDir()
    try {
      sample.limit(50).coalesce(1).write.format("graft-tfrecord").mode("append").save(dir)
      val f = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".tfrecord")).head
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      java.nio.file.Files.write(f.toPath,
        java.util.Arrays.copyOf(bytes, bytes.length - 3))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(dir, "." + f.getName + ".crc"))
      val e = intercept[org.apache.spark.SparkException] {
        spark.read.format("graft-tfrecord").schema(sample.schema).load(dir).count()
      }
      val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
      assert(msg.contains("truncated"), s"truncation must be loud: $msg")
    } finally rm(dir)
  }

  test("a multi-value feature read as a scalar type fails naming the " +
    "feature, file and the fix") {
    val dir = freshDir()
    try {
      sample.write.format("graft-tfrecord").mode("append").save(dir)
      import org.apache.spark.sql.types._
      val wrong = StructType(Seq(StructField("keys", LongType))) // keys is a 2-list
      val e = intercept[org.apache.spark.SparkException] {
        spark.read.format("graft-tfrecord").schema(wrong).load(dir).collect()
      }
      val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
      assert(msg.contains("keys") && msg.contains("2 values") &&
        msg.contains("scalar"), s"must name feature + shape: $msg")
    } finally rm(dir)
  }

  test("EMPTY arrays are rejected at write time (absent and empty share " +
    "one wire state — silent []↔null coercion is worse than an error)") {
    val dir = freshDir()
    try {
      val df = sample.limit(3)
        .withColumn("bad", when(col("l_linenumber") === 1,
          array().cast("array<long>")).otherwise(array(lit(1L))))
      val e = intercept[org.apache.spark.SparkException] {
        df.write.format("graft-tfrecord").mode("append").save(dir)
      }
      val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
      assert(msg.contains("EMPTY array") && msg.contains("bad"), msg)
    } finally rm(dir)
  }

  test("unsupported column types fail at WRITE-PLAN time, naming the " +
    "column (struct) — not per-task") {
    val dir = freshDir()
    try {
      val df = sample.limit(3).withColumn("nest",
        struct(col("l_orderkey").as("k")))
      val e = intercept[IllegalArgumentException] {
        df.write.format("graft-tfrecord").mode("append").save(dir)
      }
      assert(e.getMessage.contains("nest") &&
        e.getMessage.contains("unsupported type"), e.getMessage)
    } finally rm(dir)
  }

  test("null column values round-trip as ABSENT features (and absent " +
    "reads back as null in every type)") {
    val dir = freshDir()
    try {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("f", FloatType),
        StructField("s", StringType), StructField("bin", BinaryType),
        StructField("arr", ArrayType(LongType))))
      val rows = java.util.List.of(
        Row(1L, 1.5f, "x", Array[Byte](1, 2), Seq(1L, 2L)),
        Row(2L, null, null, null, null))
      val df = spark.createDataFrame(rows, schema)
      df.write.format("graft-tfrecord").mode("append").save(dir)
      val back = spark.read.format("graft-tfrecord").schema(schema).load(dir)
      assert(back.count() == 2)
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
      val nulls = back.filter(col("id") === 2).head()
      assert((1 to 4).forall(nulls.isNullAt), "row 2 null in every payload column")
    } finally rm(dir)
  }

  test("overwrite truncates exactly the previous queries' files; staged " +
    ".inprogress residue is invisible to readers and swept") {
    val dir = freshDir()
    try {
      sample.write.format("graft-tfrecord").mode("append").save(dir)
      val stale = java.nio.file.Paths.get(dir,
        "part-00099-deadbeef-dead-dead-dead-deaddeadbeef-42.tfrecord.inprogress")
      java.nio.file.Files.write(stale, Array[Byte](1, 2, 3))
      val back = spark.read.format("graft-tfrecord").schema(sample.schema).load(dir)
      assert(back.count() == sample.count(),
        "readers must skip .inprogress staging files entirely")
      val subset = sample.filter(col("l_returnflag") === "R")
      subset.write.format("graft-tfrecord").mode("overwrite").save(dir)
      assert(!java.nio.file.Files.exists(stale),
        "truncate must sweep stale staging residue")
      assert(spark.read.format("graft-tfrecord").schema(sample.schema)
        .load(dir).count() == subset.count())
    } finally rm(dir)
  }

  test("GZIP compression: .tfrecord.gz round-trips, mixes with plain " +
    "files in one directory, and an unknown codec fails at plan time") {
    val dir = freshDir()
    try {
      val half = sample.filter(col("l_orderkey") % 2 === 0)
      val rest = sample.filter(col("l_orderkey") % 2 =!= 0)
      half.write.format("graft-tfrecord").mode("append").save(dir)
      rest.write.format("graft-tfrecord").option("compression", "gzip")
        .mode("append").save(dir)
      val names = new java.io.File(dir).listFiles().map(_.getName)
      assert(names.exists(_.endsWith(".tfrecord")) &&
        names.exists(_.endsWith(".tfrecord.gz")),
        s"expected mixed plain+gz files: ${names.toSeq}")
      val back = spark.read.format("graft-tfrecord").schema(sample.schema).load(dir)
      assert(back.count() == sample.count())
      assert(back.exceptAll(sample).isEmpty && sample.exceptAll(back).isEmpty,
        "a mixed plain/gzip directory must read back value-identically")
      // gz files must be genuinely compressed (magic bytes 1f 8b)
      val gz = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".tfrecord.gz")).head
      val magic = java.nio.file.Files.readAllBytes(gz.toPath).take(2)
      assert(magic(0) == 0x1f.toByte && magic(1) == 0x8b.toByte)
      val e = intercept[IllegalArgumentException] {
        sample.limit(1).write.format("graft-tfrecord")
          .option("compression", "snappy").mode("append").save(dir)
      }
      assert(e.getMessage.contains("snappy"), e.getMessage)
    } finally rm(dir)
  }

  test("overwrite truncate sweeps BOTH plain and gz files of previous " +
    "queries") {
    val dir = freshDir()
    try {
      sample.write.format("graft-tfrecord").option("compression", "gzip")
        .mode("append").save(dir)
      val subset = sample.limit(7)
      subset.write.format("graft-tfrecord").mode("overwrite").save(dir)
      assert(spark.read.format("graft-tfrecord").schema(sample.schema)
        .load(dir).count() == 7,
        "truncate must sweep previous gz shards too")
    } finally rm(dir)
  }

  test("schema inference decodes ONE record: int64→long, float→float, " +
    "bytes→binary (strings need a user schema), list length≠1 → array") {
    val dir = freshDir()
    try {
      sample.select("l_orderkey", "l_qty", "l_flagbin", "keys", "vec")
        .write.format("graft-tfrecord").mode("append").save(dir)
      val inferred = spark.read.format("graft-tfrecord").load(dir).schema
      import org.apache.spark.sql.types._
      val byName = inferred.fields.map(f => f.name -> f.dataType).toMap
      assert(byName("l_orderkey") == LongType)
      assert(byName("l_qty") == FloatType)
      assert(byName("l_flagbin") == BinaryType)
      assert(byName("keys") == ArrayType(LongType, containsNull = false))
      assert(byName("vec") == ArrayType(FloatType, containsNull = false))
    } finally rm(dir)
  }
}
