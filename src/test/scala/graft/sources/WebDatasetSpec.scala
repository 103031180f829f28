package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class WebDatasetSpec extends SparkSpec {

  private def sample = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .limit(500)
    .select(
      format_string("%018d", monotonically_increasing_id()).as("__key__"),
      col("l_orderkey"), col("l_quantity"), col("l_returnflag"),
      encode(col("l_returnflag"), "UTF-8").as("l_flagbin"))

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-wds-spec-").toString

  private def rm(dir: String): Unit =
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(dir))

  test("round-trip is content-identical across the payload surface " +
    "(long/double/string/binary + the __key__ column)") {
    val dir = freshDir()
    try {
      val df = sample.cache() // pin the nondeterministic keys for comparison
      df.count()
      df.repartition(3).write.format("graft-webdataset").mode("append").save(dir)
      val back = spark.read.format("graft-webdataset").schema(df.schema).load(dir)
      assert(back.count() == df.count())
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
        "round-trip must preserve every row value-identically")
      df.unpersist()
      // shard = file = partition
      assert(back.rdd.getNumPartitions == 3)
    } finally rm(dir)
  }

  test("null values round-trip as ABSENT members; an all-null sample is " +
    "rejected loudly at write time") {
    val dir = freshDir()
    try {
      import spark.implicits._
      val df = Seq(
        ("k1", Some(7L), Some("hi")),
        ("k2", None: Option[Long], Some("yo")),
        ("k3", Some(9L), None: Option[String]))
        .toDF("__key__", "n", "s")
      df.coalesce(1).write.format("graft-webdataset").mode("append").save(dir)
      val back = spark.read.format("graft-webdataset").schema(df.schema).load(dir)
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
      val e = intercept[org.apache.spark.SparkException] {
        Seq(("k4", None: Option[Long], None: Option[String]))
          .toDF("__key__", "n", "s")
          .coalesce(1).write.format("graft-webdataset").mode("append")
          .save(freshDir())
      }
      assert(e.getMessage.contains("null") || Option(e.getCause).exists(
        _.getMessage.contains("null")), s"all-null sample must fail loudly: $e")
    } finally rm(dir)
  }

  test("column pruning reaches the scan AND skips non-required payloads") {
    val dir = freshDir()
    try {
      sample.write.format("graft-webdataset").mode("append").save(dir)
      val q = spark.read.format("graft-webdataset").schema(sample.schema).load(dir)
        .select("l_orderkey", "l_returnflag")
      val scans = q.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      assert(scans.nonEmpty &&
        scans.head.scan.readSchema().fieldNames.toSet ==
          Set("l_orderkey", "l_returnflag"),
        s"pruning must reach the tar reader: ${scans.head.scan.readSchema()}")
      val expect = sample.select("l_orderkey", "l_returnflag")
      assert(q.exceptAll(expect).isEmpty && expect.exceptAll(q).isEmpty)
    } finally rm(dir)
  }

  test("staging residue is invisible and adjacent duplicate keys are " +
    "rejected (consecutive-grouping would merge the samples)") {
    val dir = freshDir()
    try {
      sample.coalesce(1).write.format("graft-webdataset").mode("append").save(dir)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "part-00099-dead-1.tar.inprogress"),
        Array[Byte](1, 2, 3))
      assert(spark.read.format("graft-webdataset").schema(sample.schema)
        .load(dir).count() == sample.count(),
        "a staged half-written shard must be invisible to readers")
      import spark.implicits._
      val e = intercept[org.apache.spark.SparkException] {
        Seq(("dup", 1L), ("dup", 2L)).toDF("__key__", "n")
          .coalesce(1).write.format("graft-webdataset").mode("append")
          .save(freshDir())
      }
      val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
      assert(msg.contains("dup"), s"duplicate-key write must fail naming the key: $msg")
    } finally rm(dir)
  }

  test("auditUniqueKeys catches CROSS-PARTITION duplicates the per-task " +
    "guard cannot see, and passes clean multi-partition writes") {
    import spark.implicits._
    // same key in two different partitions: each writer task sees it once
    val dupAcross = Seq(("samekey", 1L), ("samekey", 2L), ("other", 3L))
      .toDF("__key__", "n")
      .repartition(2, col("n")) // split the dup keys across writer tasks
    val dirBad = freshDir()
    try {
      // without the option the write SUCCEEDS (documented default: the
      // global check is the caller's opt-in)
      dupAcross.write.format("graft-webdataset").mode("append").save(dirBad)
    } finally rm(dirBad)
    val dirBad2 = freshDir()
    try {
      val e = intercept[Exception] {
        dupAcross.write.format("graft-webdataset")
          .option("auditUniqueKeys", "true").mode("append").save(dirBad2)
      }
      val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
      assert(msg.contains("auditUniqueKeys") && msg.contains("duplicate"),
        s"cross-partition duplicate must fail the audited write loudly: $msg")
    } finally rm(dirBad2)
    val dirOk = freshDir()
    try {
      val clean = sample.cache()
      clean.count()
      clean.repartition(3).write.format("graft-webdataset")
        .option("auditUniqueKeys", "true").mode("append").save(dirOk)
      assert(spark.read.format("graft-webdataset").schema(clean.schema)
        .load(dirOk).count() == clean.count(),
        "audited clean write must publish all rows")
      clean.unpersist()
    } finally rm(dirOk)
    // the audit's read-back must survive (a) a CUSTOM key column —
    // schema inference would name the key __key__ and fail the select —
    // and (b) an EMPTY write partition's trailer-only shard, which
    // schema inference refuses outright
    val dirCustom = freshDir()
    try {
      import spark.implicits._
      Seq(("a", 1L), ("b", 2L), ("cc", 3L)).toDF("id", "n")
        .repartition(4, col("n")) // 4 partitions for 3 rows → ≥1 empty shard
        .write.format("graft-webdataset")
        .option("keyColumn", "id").option("auditUniqueKeys", "true")
        .mode("append").save(dirCustom)
      assert(spark.read.format("graft-webdataset")
        .schema("id string, n long").option("keyColumn", "id")
        .load(dirCustom).count() == 3,
        "custom-key audited write with an empty partition must publish")
    } finally rm(dirCustom)
  }

  test("corruption is loud: a flipped byte in a member header fails with " +
    "the file name and a checksum message, never a silent sample drop") {
    val dir = freshDir()
    try {
      sample.limit(50).coalesce(1)
        .write.format("graft-webdataset").mode("append").save(dir)
      val tar = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".tar")).head
      // Hadoop's local FS checksum sidecar would fire first — remove it
      // so the format's OWN verification is what trips
      val crc = new java.io.File(dir, s".${tar.getName}.crc")
      if (crc.exists()) crc.delete()
      val raf = new java.io.RandomAccessFile(tar, "rw")
      try { raf.seek(4); raf.writeByte('X') } finally raf.close()
      val e = intercept[org.apache.spark.SparkException] {
        spark.read.format("graft-webdataset").schema(sample.schema)
          .load(dir).count()
      }
      val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
      assert(msg.contains("checksum") && msg.contains(".tar"),
        s"corruption must name the file and the checksum failure: $msg")
    } finally rm(dir)
  }

  test("a CUSTOM keyColumn round-trips through BOTH sides of the option " +
    "(write names the members by it, read populates it back), and a " +
    "non-string key column fails loudly at plan time") {
    val dir = freshDir()
    try {
      import spark.implicits._
      val df = Seq(("r1", 7L, "x"), ("r2", 8L, "y"), ("r3", 9L, "z"))
        .toDF("id", "n", "s")
      df.coalesce(1).write.format("graft-webdataset")
        .option("keyColumn", "id").mode("append").save(dir)
      val back = spark.read.format("graft-webdataset")
        .option("keyColumn", "id").schema(df.schema).load(dir)
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
        "the key column must come back populated, not silent NULLs")
      val e = intercept[Exception] {
        Seq((1L, "x")).toDF("id", "s").write.format("graft-webdataset")
          .option("keyColumn", "id").mode("append").save(freshDir())
      }
      assert(e.getMessage.contains("must be string"),
        s"non-string key must fail at plan time naming the rule: $e")
    } finally rm(dir)
  }

  test("foreign shards with dotted DIRECTORY names group per sample " +
    "(the extension splits at the basename's first dot, not the path's)") {
    val dir = freshDir()
    try {
      val tar = java.nio.file.Paths.get(dir, "shard-0.tar")
      val out = new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(tar))
      // ustar prefix field is exercised by short names too — write the
      // dotted-dir members our own writer never generates
      WdsTar.writeEntry(out, "imgs.v2/0001.n", "1".getBytes)
      WdsTar.writeEntry(out, "imgs.v2/0001.s", "a".getBytes)
      WdsTar.writeEntry(out, "imgs.v2/0002.n", "2".getBytes)
      WdsTar.writeEntry(out, "imgs.v2/0002.s", "b".getBytes)
      WdsTar.writeTrailer(out)
      out.close()
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("__key__", StringType), StructField("n", LongType),
        StructField("s", StringType)))
      val back = spark.read.format("graft-webdataset").schema(schema)
        .load(dir).collect().sortBy(_.getString(0))
      assert(back.length == 2, s"two samples expected, got ${back.length}")
      assert(back.map(_.getString(0)).toSeq ==
        Seq("imgs.v2/0001", "imgs.v2/0002"))
      assert(back.map(_.getLong(1)).toSeq == Seq(1L, 2L))
      assert(back.map(_.getString(2)).toSeq == Seq("a", "b"))
    } finally rm(dir)
  }

  test("wire golden: one member's bytes are IDENTICAL to Python tarfile's " +
    "USTAR_FORMAT output (md5-pinned) — cross-implementation, not just " +
    "self-consistent") {
    // golden generated once with CPython tarfile (USTAR_FORMAT,
    // name='k0001.n', payload b'42', mode 0644, uid/gid 0, mtime 0,
    // empty uname/gname): md5 of header + padded payload + first zero
    // block. tarfile pads the archive to its 10240-byte blocking
    // factor; POSIX requires only the two zero blocks this writer
    // emits — readers accept both, the ENTRY bytes must match exactly.
    val bos = new java.io.ByteArrayOutputStream()
    WdsTar.writeEntry(bos, "k0001.n",
      "42".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    WdsTar.writeTrailer(bos)
    val ours = bos.toByteArray
    assert(ours.length == 2048, s"entry+trailer must be 4 blocks, got ${ours.length}")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(java.util.Arrays.copyOf(ours, 1536))
      .map("%02x".format(_)).mkString
    assert(md5 == "6793627f5bfbbb742a0d2175aa80acb2",
      s"ustar wire drift vs the Python tarfile golden: $md5")
  }

  test("schema inference reads only the FIRST sample and recovers names " +
    "plus heuristic payload types") {
    val dir = freshDir()
    try {
      sample.limit(20).coalesce(1)
        .write.format("graft-webdataset").mode("append").save(dir)
      val inferred = spark.read.format("graft-webdataset").load(dir).schema
      assert(inferred.fieldNames.head == "__key__")
      assert(inferred.fieldNames.toSet ==
        Set("__key__", "l_orderkey", "l_quantity", "l_returnflag", "l_flagbin"))
      // heuristic types: ASCII long -> long, ASCII double -> double
      assert(inferred("l_orderkey").dataType.simpleString == "bigint")
      assert(inferred("l_quantity").dataType.simpleString == "double")
    } finally rm(dir)
  }
}
