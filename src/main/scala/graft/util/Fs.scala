package graft.util

import java.nio.file.{Files, Path}

/** Local-filesystem helpers shared by the operators that stage
  * temporary trees (planted stream feeds, shuffle-writer audits, Avro
  * round-trips) — one implementation instead of a copy per call site.
  */
object Fs {

  /** Recursive delete; tolerates an already-missing path. */
  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val listing = Files.list(p)
      try listing.forEach(deleteRecursively) finally listing.close()
    }
    Files.deleteIfExists(p)
    ()
  }

  def deleteRecursively(p: String): Unit =
    deleteRecursively(java.nio.file.Paths.get(p))
}
