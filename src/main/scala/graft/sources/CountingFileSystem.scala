package graft.sources

import org.apache.hadoop.fs.{FSDataInputStream, FileStatus, Path}

/** A local filesystem under the `graftcount://` scheme that RECORDS every
  * metadata/read call — the instrument behind the engine's planning-cost
  * evidence: "zero-RPC planning" is a claim about filesystem round-trips,
  * so the proof is a query planned against this FS showing the calls it
  * did (not) make. Register with
  * `conf.set("fs.graftcount.impl", classOf[CountingFileSystem].getName)`
  * and address any local path as `graftcount:///abs/path`.
  *
  * Counters are JVM-global (Hadoop caches one FS instance per scheme);
  * callers reset before the measured window and must not run concurrent
  * graftcount work inside it.
  */
class CountingFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftcount:///")

  override def getFileStatus(p: Path): FileStatus = {
    CountingFileSystem.record("status", p)
    super.getFileStatus(p)
  }

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    CountingFileSystem.record("open", p)
    super.open(p, bufferSize)
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    CountingFileSystem.record("list", p)
    super.listStatus(p)
  }
}

object CountingFileSystem {
  private val events =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()

  private[sources] def record(kind: String, p: Path): Unit =
    events.add((kind, p.toString))

  def reset(): Unit = events.clear()

  /** Calls of `kind` whose path contains `pathPart` since the last reset. */
  def count(kind: String, pathPart: String): Int = {
    val it = events.iterator()
    var n = 0
    while (it.hasNext) {
      val (k, p) = it.next()
      if (k == kind && p.contains(pathPart)) n += 1
    }
    n
  }
}
