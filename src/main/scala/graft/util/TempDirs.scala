package graft.util

/** The ONE per-JVM deterministic temp-directory recipe for operators
  * that materialize a derived layout (Zorder's clustered copy, Dpp's
  * partitioned fact, the incremental-dedup snapshot index, Compact's
  * fragmented/compacted layouts, the variant shred): a path keyed by
  * (user, MD5(input dir), tag, pid).
  *
  * Why each component is there: the user sanitizes multi-tenant /tmp;
  * the input-dir digest separates SFs; the PID means two concurrent
  * JVMs (parallel bench/verify runs) can never read a directory the
  * other is mid-overwrite, while RERUNS inside one JVM stay
  * deterministic and bounded (overwrite semantics — no per-run
  * accumulation). Formerly copy-pasted five times; any future change
  * (tmp root, cleanup policy) lands here once.
  */
object TempDirs {

  def forInput(inputDir: String, tag: String): String = {
    val user = sys.props.getOrElse("user.name", "anon").replaceAll("[^A-Za-z0-9._-]", "_")
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(inputDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val pid = ProcessHandle.current().pid()
    java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft-$user", s"$tag-$digest-p$pid").toString
  }
}
