package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `binaryFile` ingestion (SURVEY.md §2e) — the path multimodal
  * payloads actually ARRIVE through: a directory of opaque blobs
  * (images, audio) read as (path, modificationTime, length, content)
  * rows, filtered by `pathGlobFilter` AT LISTING time (pruned files
  * are never opened — the multimodal twin of partition pruning), ids
  * recovered from file names, then joined to typed metadata and
  * handed to the decode operators ([[graft.multimodal.Multimodal]]).
  *
  * Scale notes: one task per file (binaryFile never splits a blob);
  * `spark.sql.files.maxPartitionBytes` packs small files into shared
  * tasks, and the source hard-caps single blobs at
  * `spark.sql.sources.binaryFile.maxLength` (Int.MaxValue) — shard
  * larger payloads upstream. The length column comes from the file
  * LISTING, so size-based triage (`length < cap`) filters before any
  * content is read.
  */
object BinaryFiles {

  /** Write each row's blob as `<prefix><id>.<ext>` under `dir` —
    * executor-side via the Hadoop FS API (the ModelIO discipline), one
    * file per row, the layout a crawler or export job produces.
    */
  def writeBlobs(df: DataFrame, idCol: String, blobCol: String,
                 dir: String, prefix: String, ext: String): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col(idCol).cast("long"), col(blobCol)).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(conf.value)
        rows.foreach { r =>
          val out = fs.create(
            new org.apache.hadoop.fs.Path(dir, s"$prefix${r.getLong(0)}.$ext"), true)
          try out.write(r.getAs[Array[Byte]](1)) finally out.close()
        }
    }
  }

  /** Read `<prefix><id>.<ext>` blobs back as (doc_id, content,
    * length) — the listing glob AND the id regex are both anchored on
    * the exact prefix/ext pair [[writeBlobs]] takes, so digit-bearing
    * extensions ("mp4") and digit-ending prefixes ("v2_") parse
    * correctly instead of shifting digits into the id (a bare
    * `(\d+)\.[a-z]+$` corrupts both cases).
    */
  def readBlobs(spark: SparkSession, dir: String,
                prefix: String, ext: String): DataFrame = {
    val q = java.util.regex.Pattern.quote _
    spark.read.format("binaryFile")
      .option("pathGlobFilter", s"$prefix*.$ext")
      .load(dir)
      .select(
        regexp_extract(col("path"), s"${q(prefix)}(\\d+)\\.${q(ext)}$$", 1)
          .cast("long").as("doc_id"),
        col("content"), col("length"))
  }
}
