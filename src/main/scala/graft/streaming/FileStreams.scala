package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared file-stream bootstrap for the bounded streaming runners:
  * Spark's FileStreamSource requires a DIRECTORY, but the test tables
  * are single parquet files — stream from a temp dir holding a symlink
  * when needed. One place, not one copy per runner.
  */
object FileStreams {

  /** One streamable dir per table path for the JVM's lifetime: a
    * CHECKPOINTED query records the source path in its offset log, so a
    * restart must resolve the same table to the same directory — a
    * fresh temp dir per call would fail the restart (and defeat
    * exactly-once).
    */
  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A streamable directory for `tablePath` (itself if already a dir). */
  def streamableDir(tablePath: String): String = {
    val src = java.nio.file.Paths.get(tablePath)
    if (java.nio.file.Files.isDirectory(src)) src.toString
    else dirs.computeIfAbsent(tablePath, { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft-stream-")
      dir.toFile.deleteOnExit()
      java.nio.file.Files.createSymbolicLink(dir.resolve(src.getFileName), src)
      dir.toString
    })
  }

  /** File-stream `tablePath` with the schema of its batch read. */
  def readStream(spark: SparkSession, tablePath: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(tablePath).schema)
      .parquet(streamableDir(tablePath))
}
