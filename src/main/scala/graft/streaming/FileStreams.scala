package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared file-stream bootstrap for the bounded streaming runners:
  * Spark's FileStreamSource requires a DIRECTORY, but the test tables
  * are single parquet files — stream from a temp dir holding a symlink
  * when needed. One place, not one copy per runner.
  */
object FileStreams {

  /** A streamable directory for `tablePath` (itself if already a dir). */
  def streamableDir(tablePath: String): String = {
    val src = java.nio.file.Paths.get(tablePath)
    if (java.nio.file.Files.isDirectory(src)) src.toString
    else {
      val dir = java.nio.file.Files.createTempDirectory("graft-stream-")
      dir.toFile.deleteOnExit()
      java.nio.file.Files.createSymbolicLink(dir.resolve(src.getFileName), src)
      dir.toString
    }
  }

  /** File-stream `tablePath` with the schema of its batch read. */
  def readStream(spark: SparkSession, tablePath: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(tablePath).schema)
      .parquet(streamableDir(tablePath))
}
