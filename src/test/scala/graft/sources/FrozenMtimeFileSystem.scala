package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}

/** A local filesystem under `graftfroz://` whose DIRECTORY mtimes are
  * frozen at [[FrozenMtimeFileSystem.mtime]] — the object-store
  * simulator for plan-time freshness tests (TEST SCAFFOLDING, test
  * classpath only): S3A-style "fake directory" prefixes commonly report
  * mtime 0 (or a constant) and never bump on child create/delete, so
  * any cache keyed on a dir stamp would serve a pre-publish listing
  * forever. File mtimes stay real (manifest-cache stamps key on files,
  * which object stores do version) — EXCEPT the `_epoch` object when
  * [[FrozenMtimeFileSystem.freezeEpochFile]] is on, the harshest store
  * shape: even the epoch's mtime is constant, so only its length-growth
  * channel can flip a cross-process freshness stamp.
  */
class FrozenMtimeFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfroz:///")

  override def getFileStatus(p: Path): FileStatus = {
    val st = super.getFileStatus(p)
    if (st.isDirectory ||
        (FrozenMtimeFileSystem.freezeEpochFile && p.getName == "_epoch"))
      new FileStatus(st.getLen, st.isDirectory, st.getReplication,
        st.getBlockSize, FrozenMtimeFileSystem.mtime, st.getPath)
    else st
  }
}

object FrozenMtimeFileSystem {
  /** The constant every directory reports as its modification time. */
  @volatile var mtime: Long = 0L

  /** Freeze the `_epoch` object's mtime too (length stays real). */
  @volatile var freezeEpochFile: Boolean = false
}
