package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared file-stream bootstrap for the bounded streaming runners:
  * Spark's FileStreamSource requires a DIRECTORY, but the test tables
  * are single parquet files — stream from a temp dir holding a symlink
  * when needed. One place, not one copy per runner.
  */
object FileStreams {

  /** A checkpointed query records the source path in its offset and
    * seen-files logs, so EVERY run — same JVM or a restarted process —
    * must resolve the same table to the same directory, or the restart
    * re-reads the whole input as new files (defeating exactly-once).
    * The dir name is therefore a pure function of the table path (md5),
    * not a random temp dir.
    */
  def streamableDir(tablePath: String): String = {
    val src = java.nio.file.Paths.get(tablePath)
    if (java.nio.file.Files.isDirectory(src)) src.toString
    else {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(tablePath.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val dir = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), s"graft-stream-$digest")
      java.nio.file.Files.createDirectories(dir)
      val link = dir.resolve(src.getFileName)
      // NOFOLLOW + catch: the shared deterministic dir is reachable from
      // concurrent JVMs (Bench and Verify on the same table), so the
      // exists/create pair must tolerate losing the race; NOFOLLOW also
      // keeps a dangling link from reading as absent forever.
      if (!java.nio.file.Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        try java.nio.file.Files.createSymbolicLink(link, src)
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
      }
      dir.toString
    }
  }

  /** File-stream `tablePath` with the schema of its batch read. */
  def readStream(spark: SparkSession, tablePath: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(tablePath).schema)
      .parquet(streamableDir(tablePath))
}
