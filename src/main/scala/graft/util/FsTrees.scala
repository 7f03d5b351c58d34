package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileUtil, Path}

/** Filesystem tree cloning shared by every snapshot surface
  * ([[graft.api.Keyspace.snapshot]] for column families,
  * [[graft.streaming.PipelineStream.snapshotRunStore]] for the
  * retrieval/ANN run stores): parquet runs are immutable once
  * published, so a HARD LINK is a complete, consistent, O(#files)
  * clone that costs no data IO and survives the source's later
  * compaction/GC (links keep the inodes alive) — exactly the
  * reference's SSTable snapshot semantics
  * (db/ColumnFamilyStore.java:1283-1330). On filesystems without
  * link support (object stores) each file falls back to a copy; at
  * 100 TB the same contract is a manifest pin + deferred deletion.
  */
object FsTrees {

  /** Reader-visible name: hidden (`_`/`.`-prefixed) entries are
    * invisible to Spark readers — the ONE definition every walker
    * (integrity, census, key enumeration) shares.
    */
  def readerVisible(n: String): Boolean =
    !n.startsWith("_") && !n.startsWith(".")

  /** Maintenance-residue dir names (retired/unpublished output a
    * reader never opens): legacy swap leftovers and staging dirs.
    */
  def residueName(n: String): Boolean =
    n.endsWith("__old") || n.endsWith("__compact") || n.endsWith("_next")

  /** All reader-visible FILES under `p`, recursing only into
    * reader-visible, non-residue directories.
    */
  def walkFiles(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (!readerVisible(n) || residueName(n)) Nil
      else if (st.isDirectory) walkFiles(fs, st.getPath)
      else Seq(st)
    }

  /** Recursively clone `src` into `dst`, hard-linking files when the
    * filesystem supports it (local/posix), copying otherwise.
    */
  def linkTree(src: Path, dst: Path, conf: Configuration): Unit = {
    val fs = src.getFileSystem(conf)
    fs.mkdirs(dst)
    fs.listStatus(src).foreach { st =>
      val target = new Path(dst, st.getPath.getName)
      if (st.isDirectory) linkTree(st.getPath, target, conf)
      else {
        val linkable = {
          val s = st.getPath.toUri.getScheme
          (s == null || s == "file") &&
            target.toUri.getScheme == st.getPath.toUri.getScheme
        }
        def copy(): Unit =
          FileUtil.copy(fs, st.getPath, target.getFileSystem(conf), target,
            false, conf)
        if (linkable)
          try java.nio.file.Files.createLink(
            java.nio.file.Paths.get(target.toUri.getPath),
            java.nio.file.Paths.get(st.getPath.toUri.getPath))
          catch { case _: UnsupportedOperationException | _: java.io.IOException => copy() }
        else copy()
      }
    }
  }
}
