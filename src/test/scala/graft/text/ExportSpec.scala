package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExportSpec extends SparkSpec {

  test("corpus_export_tfrecord: the read-back census equals a census " +
    "computed directly from the source (nothing lost in the shards)") {
    val got = Export.corpusExportTfRecord(spark, sf0001).head()
    val toks = regexp_extract_all(col("text"),
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))
    val direct = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("lang"),
        transform(toks, t => length(t).cast("long")).as("lens"))
      .withColumn("nt", size(col("lens")).cast("long"))
      .filter(col("nt") > 0)
      .agg(count(lit(1)), sum("doc_id"), countDistinct("lang"), sum("nt"),
        max("nt"), sum(aggregate(col("lens"), lit(0L), (a, x) => a + x)))
      .head()
    assert(got.toSeq == direct.toSeq,
      s"export census drift: ${got.toSeq} vs ${direct.toSeq}")
    assert(got.getLong(0) > 0 && got.getLong(5) > got.getLong(3),
      "census must be non-degenerate (chars > tokens)")
  }

  test("export parallelism follows nShards: every shard file is a real " +
    "TFRecord the dataloader-side reader accepts") {
    // run a tiny export into an inspectable dir by replaying the same
    // write the operator performs
    val toks = regexp_extract_all(col("text"),
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))
    val records = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("lang"),
        transform(toks, t => length(t).cast("long")).as("token_lens"))
      .withColumn("n_tokens", size(col("token_lens")).cast("long"))
      .filter(col("n_tokens") > 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-export-spec-")
    try {
      records.repartition(3)
        .write.format("graft-tfrecord").mode("append").save(dir.toString)
      val files = new java.io.File(dir.toString).listFiles()
        .filter(_.getName.endsWith(".tfrecord"))
      assert(files.length == 3, s"3 shards requested: got ${files.length}")
      val back = spark.read.format("graft-tfrecord")
        .schema(records.schema).load(dir.toString)
      assert(back.rdd.getNumPartitions == 3, "shard = file = read partition")
      assert(back.count() == records.count())
      assert(back.exceptAll(records).isEmpty && records.exceptAll(back).isEmpty,
        "every document and every token-length list survives byte-exactly")
    } finally graft.util.Fs.deleteRecursively(dir)
  }
}
