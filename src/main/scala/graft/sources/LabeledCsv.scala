package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink for the reference engine's training-data format: CSV
  * rows `label,f1,f2,...,fd` with an integer class label and `d` float
  * features, no header (reference: cascade_svm/Midcascade.java:111-116
  * parses exactly this shape; all three meta-algorithms share it).
  *
  * Scale notes: the schema is supplied explicitly — schema inference
  * costs an extra full pass over 100 TB. Reading is Spark's native CSV
  * datasource (splittable, column-pruned); writing renders each row
  * with a single codegen'd concat_ws, so both directions stream without
  * driver involvement.
  */
object LabeledCsv {

  /** Explicit schema: label int + d double feature columns. */
  def schema(dim: Int): StructType =
    StructType(
      StructField("label", IntegerType, nullable = false) +:
        (1 to dim).map(i => StructField(s"f$i", DoubleType, nullable = false)))

  /** Read `label,f1..fd` CSV into (row_id, label, features array<float>).
    * `row_id` is a partition-local monotonic id — unique and stable for
    * a fixed input layout, NOT contiguous (contiguity would need a
    * global pass; the id only routes subset assignment downstream).
    *
    * `mode` is Spark's CSV parse mode — at corpus scale malformed rows
    * are a certainty, and the choice is policy: "PERMISSIVE" (default)
    * null-fills bad fields so downstream filters decide,
    * "DROPMALFORMED" silently drops bad rows, "FAILFAST" aborts the
    * job on the first one.
    */
  def read(spark: SparkSession, path: String, dim: Int,
           mode: String = "PERMISSIVE"): DataFrame =
    spark.read
      .schema(schema(dim))
      .option("header", "false")
      .option("mode", mode)
      .csv(path)
      .select(
        monotonically_increasing_id().as("row_id"),
        col("label"),
        array((1 to dim).map(i => col(s"f$i").cast("float")): _*).as("features"))

  /** Shared (vec_id, label, embedding) projection for [[readStream]] /
    * [[readAsEmbeddings]]: vec_id is a CONTENT hash (xxhash64 over label
    * + features), identical whether the row arrives in a batch scan or a
    * micro-batch — a partition-local counter would renumber per batch,
    * and a global counter is a coordination pass 100 TB can't afford.
    */
  private def project(df: DataFrame, dim: Int): DataFrame =
    df.select(
      xxhash64(col("label") +: (1 to dim).map(i => col(s"f$i")): _*).as("vec_id"),
      col("label"),
      array((1 to dim).map(i => col(s"f$i").cast("float")): _*).as("embedding"))

  /** File-stream `label,f1..fd` CSVs as (vec_id, label, embedding) —
    * the streaming twin of [[read]] for feeding
    * [[graft.streaming.StreamingSvm]] with the reference's own training
    * format as files arrive (the reference's equivalent: new HDFS input
    * between driver iterations).
    */
  def readStream(spark: SparkSession, path: String, dim: Int,
                 maxFilesPerTrigger: Int = 1): DataFrame =
    project(
      spark.readStream.schema(schema(dim))
        .option("header", "false")
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .csv(path),
      dim)

  /** Batch read with the SAME projection as [[readStream]] — the
    * batch/stream parity surface (same ids, same schema).
    */
  def readAsEmbeddings(spark: SparkSession, path: String, dim: Int): DataFrame =
    project(
      spark.read.schema(schema(dim)).option("header", "false").csv(path),
      dim)

  /** Write (label, features) back to the reference CSV shape. */
  def write(df: DataFrame, path: String): Unit =
    df.select(
        concat_ws(",",
          col("label").cast("string"),
          concat_ws(",", transform(col("features"), f => f.cast("double").cast("string"))))
          .as("value"))
      .write.mode("overwrite").text(path)
}
