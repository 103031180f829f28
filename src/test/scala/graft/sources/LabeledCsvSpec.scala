package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabeledCsvSpec extends SparkSpec {

  test("reads the reference CSV shape into (row_id, label, features)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv-spec-")
    java.nio.file.Files.writeString(dir.resolve("train.csv"),
      "3,0.5,1.25,-2.0\n7,0.0,0.125,9.5\n")
    val df = LabeledCsv.read(spark, dir.toString, dim = 3).orderBy("label").collect()
    assert(df.length == 2)
    assert(df(0).getAs[Int]("label") == 3)
    assert(df(0).getSeq[Float](2) == Seq(0.5f, 1.25f, -2.0f))
    assert(df(1).getAs[Int]("label") == 7)
    assert(df(1).getSeq[Float](2) == Seq(0.0f, 0.125f, 9.5f))
    // ids unique (not necessarily contiguous)
    assert(df.map(_.getAs[Long]("row_id")).distinct.length == 2)
  }

  test("malformed rows: PERMISSIVE null-fills, DROPMALFORMED drops, FAILFAST throws") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv-bad-")
    java.nio.file.Files.writeString(dir.resolve("train.csv"),
      "3,0.5,1.25,-2.0\nnot,a,valid,row\n7,0.0,0.125,9.5\n")
    val permissive = LabeledCsv.read(spark, dir.toString, dim = 3).collect()
    assert(permissive.length == 3)
    assert(permissive.count(_.isNullAt(1)) == 1, "bad row should null-fill its label")
    val dropped = LabeledCsv.read(spark, dir.toString, dim = 3, mode = "DROPMALFORMED").collect()
    assert(dropped.length == 2 && dropped.forall(!_.isNullAt(1)))
    intercept[org.apache.spark.SparkException] {
      LabeledCsv.read(spark, dir.toString, dim = 3, mode = "FAILFAST").collect()
    }
  }

  test("streaming read: batch/stream parity on the same CSV input") {
    import graft.streaming.StreamingSvm
    import graft.svm.{Kernel, Smo}
    val dir = java.nio.file.Files.createTempDirectory("graft-csv-stream-").toString
    val slice = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") < 120)
      .select(col("label"), col("embedding").as("features"))
    LabeledCsv.write(slice.repartition(1), s"$dir/in")

    val params = Smo.Params(kernel = Kernel.Linear)
    // batch: one processBatch over the batch projection
    val batchTrainer = new StreamingSvm(params)
    batchTrainer.processBatch(
      LabeledCsv.readAsEmbeddings(spark, s"$dir/in", dim = 64), 0L)
    // stream: the same single file arrives as one micro-batch
    val streamTrainer = new StreamingSvm(params)
    streamTrainer.runBoundedCsv(spark, s"$dir/in", dim = 64)

    assert(streamTrainer.batchStats.nonEmpty)
    assert(streamTrainer.batchStats.map(s => (s._2, s._3, s._4)).toList ==
      batchTrainer.batchStats.map(s => (s._2, s._3, s._4)).toList,
      "same file must produce the same (rows, newSVs, globalSVs) trajectory")
    assert(streamTrainer.globalSvCount == batchTrainer.globalSvCount)
    // content-hash ids: identical between the two read paths
    val a = LabeledCsv.readAsEmbeddings(spark, s"$dir/in", dim = 64)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a.distinct.length == a.length, "content ids must be unique on this slice")
  }

  test("write → read round-trips the embeddings table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv-rt-").toString
    val orig = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("label"), col("embedding").as("features"))
    LabeledCsv.write(orig, s"$dir/out")
    val back = LabeledCsv.read(spark, s"$dir/out", dim = 64)
    assert(back.count() == orig.count())
    // per-label feature-sum totals survive the round trip (order-free check)
    def sums(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("label")
      .agg(round(sum(aggregate(col("features"), lit(0.0),
        (a, v) => a + v.cast("double"))), 3).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(sums(back) == sums(orig))
  }
}
