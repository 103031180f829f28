package graft.sources

import org.apache.hadoop.fs.Path

/** The staged-rename task-output protocol shared by the graft file
  * sinks (graft-avro, graft-tfrecord): every task attempt streams into
  * `<final>.inprogress` (invisible to readers) and renames inside
  * `DataWriter.commit()`, which Spark's commit coordinator grants to
  * exactly one attempt — zombies never publish. Job-level commit then
  * sweeps this query's dead-attempt staging residue, and under
  * truncate-overwrite deletes exactly the previous queries' data files
  * (matched by the sink's own `isData` suffix predicate) plus any stale
  * staging residue they left. Concurrent COMMITTED writers racing a
  * truncate are unsupported (same contract as Spark's built-in file
  * sources); the sweep guarantee covers staging residue only.
  */
object StagedCommit {

  def jobCommit(path: String, queryId: String, truncate: Boolean,
                isData: String => Boolean): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(AvroHadoop.sessionConf())
    val listing = fs.listStatus(dir)
    listing.filter(st => st.getPath.getName.endsWith(".inprogress") &&
      st.getPath.getName.contains(queryId))
      .foreach(st => fs.delete(st.getPath, false))
    // truncate sweeps BOTH previous queries' committed files and any
    // stale staging residue a crashed previous query left behind —
    // otherwise dead .inprogress files linger forever
    if (truncate) listing
      .filter(st => (isData(st.getPath.getName) ||
        st.getPath.getName.endsWith(".inprogress")) &&
        !st.getPath.getName.contains(queryId))
      .foreach(st => fs.delete(st.getPath, false))
  }

  def jobAbort(path: String, queryId: String): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(AvroHadoop.sessionConf())
    if (fs.exists(dir)) fs.listStatus(dir)
      .filter(_.getPath.getName.contains(queryId))
      .foreach(st => fs.delete(st.getPath, false))
  }
}
