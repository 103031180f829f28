package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class AvroSpec extends SparkSpec {

  private def sample = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      col("l_returnflag"), col("l_shipdate"),
      to_date(col("l_shipdate")).as("l_shipday"),
      (col("l_returnflag") === "R").as("l_returned"),
      encode(col("l_returnflag"), "UTF-8").as("l_flagbin"))

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-avro-spec-").toString

  private def rm(dir: String): Unit = {
    def go(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val l = java.nio.file.Files.list(p); try l.forEach(go) finally l.close()
      }
      java.nio.file.Files.deleteIfExists(p); ()
    }
    go(java.nio.file.Paths.get(dir))
  }

  test("round-trip is content-identical across the whole type surface " +
    "(long/int/double/string/timestamp/date/boolean/binary + nulls)") {
    val dir = freshDir()
    try {
      val df = sample
      df.write.format("graft-avro").mode("append").save(dir)
      val back = spark.read.format("graft-avro").load(dir)
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        df.schema.map(f => (f.name, f.dataType)),
        s"schema drift: ${back.schema} vs ${df.schema}")
      assert(back.count() == df.count())
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
        "round-trip must preserve every row value-identically")
    } finally rm(dir)
  }

  test("column pruning reaches the scan: readSchema is the projection, " +
    "not the file schema") {
    val dir = freshDir()
    try {
      sample.write.format("graft-avro").mode("append").save(dir)
      val q = spark.read.format("graft-avro").load(dir)
        .select("l_orderkey", "l_returnflag")
      val scans = q.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      assert(scans.nonEmpty, "expected a BatchScan")
      assert(scans.head.scan.readSchema().fieldNames.toSet ==
        Set("l_orderkey", "l_returnflag"),
        s"pruning must reach the Avro decoder: ${scans.head.scan.readSchema()}")
      // and the pruned read still returns correct values
      val expect = sample.select("l_orderkey", "l_returnflag")
      assert(q.exceptAll(expect).isEmpty && expect.exceptAll(q).isEmpty)
    } finally rm(dir)
  }

  test("reads split within one file on sync boundaries: many partitions, " +
    "no row lost or doubled") {
    val dir = freshDir()
    try {
      sample.coalesce(1).write.format("graft-avro").mode("append").save(dir)
      val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
      try {
        spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
        val back = spark.read.format("graft-avro").load(dir)
        assert(back.rdd.getNumPartitions > 4,
          s"a single file must fan out across byte-range splits, " +
            s"got ${back.rdd.getNumPartitions}")
        assert(back.count() == sample.count(),
          "split reads must cover every block exactly once")
        assert(back.exceptAll(sample).isEmpty)
      } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    } finally rm(dir)
  }

  test("overwrite truncates exactly the previous queries' files") {
    val dir = freshDir()
    try {
      sample.write.format("graft-avro").mode("append").save(dir)
      val subset = sample.filter(col("l_returnflag") === "R")
      subset.write.format("graft-avro").mode("overwrite").save(dir)
      val back = spark.read.format("graft-avro").load(dir)
      assert(back.count() == subset.count(),
        "after overwrite only the new query's rows remain")
    } finally rm(dir)
  }

  test("null VALUES round-trip in every supported type (union[null,T] " +
    "encoding actually exercised, not just declared)") {
    val dir = freshDir()
    try {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("i", IntegerType),
        StructField("d", DoubleType), StructField("s", StringType),
        StructField("b", BooleanType), StructField("bin", BinaryType),
        StructField("ts", TimestampType), StructField("day", DateType)))
      val rows = java.util.List.of(
        Row(1L, 7, 1.5, "x", true, Array[Byte](1, 2),
          java.sql.Timestamp.valueOf("2024-01-02 03:04:05"),
          java.sql.Date.valueOf("2024-01-02")),
        Row(2L, null, null, null, null, null, null, null))
      val df = spark.createDataFrame(rows, schema)
      df.write.format("graft-avro").mode("append").save(dir)
      val back = spark.read.format("graft-avro").load(dir)
      assert(back.count() == 2)
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
        "null values must survive the union[null,T] round-trip in every type")
      val nulls = back.filter(col("id") === 2).head()
      assert((1 to 7).forall(nulls.isNullAt), "row 2 is null in every payload column")
    } finally rm(dir)
  }

  test("staging residue is invisible to readers and swept by overwrite: " +
    "a crashed attempt's .inprogress file never surfaces as data") {
    val dir = freshDir()
    try {
      sample.write.format("graft-avro").mode("append").save(dir)
      // plant a dead attempt's staging file (garbage bytes, stale query id)
      val stale = java.nio.file.Paths.get(dir,
        "part-00099-deadbeef-dead-dead-dead-deaddeadbeef-42.avro.inprogress")
      java.nio.file.Files.write(stale, Array[Byte](1, 2, 3))
      val back = spark.read.format("graft-avro").load(dir)
      assert(back.count() == sample.count(),
        "readers must skip .inprogress staging files entirely")
      // an overwrite sweeps the stale residue along with old data files
      sample.limit(5).write.format("graft-avro").mode("overwrite").save(dir)
      assert(!java.nio.file.Files.exists(stale),
        "truncate must sweep stale staging residue of previous queries")
      assert(spark.read.format("graft-avro").load(dir).count() == 5)
    } finally rm(dir)
  }

  test("decimal and nested-record columns round-trip exactly, including " +
    "nulls at both levels (the CDC payload shapes)") {
    val dir = freshDir()
    try {
      val df = sample.select(
        col("l_orderkey"),
        col("l_quantity").cast("decimal(12,2)").as("dec"),
        when(col("l_linenumber") =!= 1, col("l_quantity").cast("decimal(20,4)"))
          .as("dec_null"), // null decimals on ~1/4 of rows
        struct(col("l_returnflag").as("flag"), col("l_linenumber").as("ln"),
          col("l_quantity").cast("decimal(10,3)").as("q")).as("nest"),
        when(col("l_linenumber") =!= 2,
          struct(struct(col("l_orderkey").as("ok")).as("inner"),
            col("l_returnflag").as("f"))).as("deep")) // null + doubly nested
      df.write.format("graft-avro").mode("append").save(dir)
      val back = spark.read.format("graft-avro").load(dir)
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        df.schema.map(f => (f.name, f.dataType)),
        s"schema drift: ${back.schema.treeString} vs ${df.schema.treeString}")
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
        "decimal + nested round-trip must preserve every value exactly")
    } finally rm(dir)
  }

  test("selecting ONE field of a nested record reads correct values " +
    "(nested decode resolves by name, whatever the required shape)") {
    val dir = freshDir()
    try {
      sample.select(col("l_orderkey"),
        struct(col("l_returnflag").as("flag"), col("l_linenumber").as("ln"))
          .as("nest"))
        .write.format("graft-avro").mode("append").save(dir)
      val got = spark.read.format("graft-avro").load(dir)
        .select(col("l_orderkey"), col("nest.ln").as("ln"))
      val expect = sample.select(col("l_orderkey"), col("l_linenumber").as("ln"))
      assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
        "nested field selection must survive whatever pruning Spark pushes")
    } finally rm(dir)
  }

  test("a required column absent from a file's writer schema fails with " +
    "an error naming the file and the column, not an NPE") {
    val dir = freshDir()
    try {
      sample.write.format("graft-avro").mode("append").save(dir)
      import org.apache.spark.sql.types._
      val userSchema = StructType(Seq(
        StructField("l_orderkey", LongType),
        StructField("no_such_column", StringType)))
      val e = intercept[org.apache.spark.SparkException] {
        // select the column, not count(): a bare count prunes every
        // column and the reader legitimately never needs the absent one
        spark.read.format("graft-avro").schema(userSchema).load(dir)
          .select("no_such_column").collect()
      }
      val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
      assert(msg.contains("no_such_column"), s"error must name the missing column: $msg")
      assert(msg.contains(".avro"), s"error must name the file: $msg")
      assert(!msg.contains("NullPointerException"), s"must not be an NPE: $msg")
    } finally rm(dir)
  }

  test("a required column whose TYPE differs from the writer's fails " +
    "loudly — a mismatched decimal scale must not silently rescale") {
    val dir = freshDir()
    try {
      sample.select(col("l_orderkey"),
        col("l_quantity").cast("decimal(12,2)").as("dec"))
        .write.format("graft-avro").mode("append").save(dir)
      import org.apache.spark.sql.types._
      val wrong = StructType(Seq(
        StructField("l_orderkey", LongType),
        StructField("dec", DecimalType(12, 4)))) // written at scale 2
      val e = intercept[org.apache.spark.SparkException] {
        spark.read.format("graft-avro").schema(wrong).load(dir)
          .select("dec").collect()
      }
      val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
      assert(msg.contains("dec") && msg.contains("decimal(12,2)") &&
        msg.contains("decimal(12,4)"),
        s"must name the column and both types, not rescale 100x: $msg")
    } finally rm(dir)
  }

  test("Avro's legal numeric promotions read correctly (int->long, " +
    "int->double, float->double), while a non-promotion still fails " +
    "loudly (round-11 advice: the drift check must not reject reads " +
    "schema resolution supports)") {
    val dir = freshDir()
    try {
      sample.select(
        col("l_linenumber"), // int
        col("l_quantity").cast("float").as("qty_f"))
        .write.format("graft-avro").mode("append").save(dir)
      import org.apache.spark.sql.types._
      val promoted = StructType(Seq(
        StructField("l_linenumber", LongType),   // written int
        StructField("qty_f", DoubleType)))       // written float
      val back = spark.read.format("graft-avro").schema(promoted).load(dir)
      val got = back.agg(
        sum("l_linenumber").as("s"),
        sum(floor(col("qty_f") * 100 + 0.5)).as("c")).head()
      val expect = sample.agg(
        sum(col("l_linenumber").cast("long")).as("s"),
        sum(floor(col("l_quantity").cast("float").cast("double") * 100 + 0.5))
          .as("c")).head()
      assert(got == expect, s"promoted read drift: $got vs $expect")
      // a DEMOTION (long asked as int) is not an Avro promotion: loud
      val demoted = StructType(Seq(StructField("l_linenumber", StringType)))
      val e = intercept[org.apache.spark.SparkException] {
        spark.read.format("graft-avro").schema(demoted).load(dir).collect()
      }
      val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
      assert(msg.contains("l_linenumber") && msg.contains("int"),
        s"non-promotion must still fail loudly naming the types: $msg")
    } finally rm(dir)
  }

  test("schema inference reads one file header, never the data") {
    val dir = freshDir()
    try {
      sample.write.format("graft-avro").mode("append").save(dir)
      val inferred = spark.read.format("graft-avro").load(dir).schema
      assert(inferred.fieldNames.toSeq == sample.schema.fieldNames.toSeq)
    } finally rm(dir)
  }
}
