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
    import java.nio.file.{Files, LinkOption, Paths}
    val src = Paths.get(tablePath)
    if (Files.isDirectory(src)) src.toString
    else {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(tablePath.getBytes("UTF-8")).map("%02x".format(_)).mkString
      // Scoped under a per-user root: a world-shared /tmp name would let
      // another user's pre-existing dir (or pre-planted symlink) break —
      // or hijack — the stream listing on a multi-user host.
      val user = sys.props.getOrElse("user.name", "anon").replaceAll("[^A-Za-z0-9._-]", "_")
      val dir = Paths.get(
        System.getProperty("java.io.tmpdir"), s"graft-$user", s"stream-$digest")
      Files.createDirectories(dir)
      val link = dir.resolve(src.getFileName)
      // NOFOLLOW + catch: the deterministic dir is reachable from
      // concurrent JVMs of the same user (Bench and Verify on the same
      // table), so the exists/create pair must tolerate losing the race;
      // NOFOLLOW also keeps a dangling link from reading as absent
      // forever. A link whose target no longer matches the source (stale
      // from a renamed/recreated table) is repaired, not trusted.
      if (Files.exists(link, LinkOption.NOFOLLOW_LINKS)) {
        val stale = !Files.isSymbolicLink(link) ||
          Files.readSymbolicLink(link) != src ||
          !Files.exists(src)
        if (stale) {
          Files.delete(link)
          try Files.createSymbolicLink(link, src)
          catch { case _: java.nio.file.FileAlreadyExistsException => () }
        }
      } else {
        try Files.createSymbolicLink(link, src)
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

  /** Fresh per-run (sink, checkpoint) directory pair for a bounded
    * streaming run that materializes its output before returning.
    * Unlike [[streamableDir]] (deterministic on purpose — a restartable
    * checkpoint must resolve to the same path), a bounded parity run IS
    * the unit of work, so a random per-run root makes concurrent runs
    * of the same query on the same dataset disjoint writers rather than
    * racing overwriters.
    */
  def freshSinkDirs(tag: String): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory(s"graft-$tag-")
    (base.resolve("out").toString, base.resolve("ckpt").toString)
  }
}
