package graft

/** Mutable scratch allocation for queries. `Verify` (and the bench's
  * repeat runs) execute queries CONCURRENTLY in one JVM; that pooling is
  * only sound if no two queries share a mutable scratch path. This
  * registry ENFORCES the discipline Verify's comment used to merely
  * describe: a path is claimed by exactly one owner (the query name) for
  * the process lifetime — a second query requesting the same path fails
  * loudly at claim time instead of racing at write time. Re-claims by
  * the same owner are fine (min-of-k bench reruns, idempotent reruns).
  *
  * Shared IMMUTABLE artifacts (the content-fingerprint-keyed model and
  * pair-graph caches under graft-models / graft-scratch) are exempt by
  * design: they are build-once-read-many and deliberately cross-query.
  */
object Scratch {
  private val owners = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** A mutable scratch dir under `graft-ops`, unique per (kind, sfDir),
    * claimed for `owner`. Throws on cross-owner collision.
    */
  def dir(owner: String, kind: String, sfDir: String): String =
    claim(owner,
      s"${sys.props("java.io.tmpdir")}/graft-ops/${kind}_${sfDir.replaceAll("[^a-z0-9.]", "_")}")

  /** A THROWAWAY dir for one streaming run's checkpoint, on tmpfs when the
    * host has one (a short local streaming run's fixed cost is dominated
    * by WAL/state-store fsyncs, which tmpfs absorbs). Unique per call —
    * a reused checkpoint would make a re-run resume already-committed
    * offsets and process nothing. Caller deletes it after the run. On a
    * real cluster checkpoints are durable HDFS paths chosen by the
    * operator; this helper is only for harness-local runs-to-completion.
    */
  def ephemeralCheckpoint(owner: String): String = {
    val shm = new java.io.File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) shm.getPath else sys.props("java.io.tmpdir")
    val parent = claim(owner, s"$base/graft-stream-ck/$owner")
    s"$parent/${java.util.UUID.randomUUID().toString.take(12)}"
  }

  /** Register `path` as owned by `owner`; loud on cross-owner collision. */
  def claim(owner: String, path: String): String = {
    val prev = owners.putIfAbsent(path, owner)
    require(prev == null || prev == owner,
      s"scratch collision: $path already claimed by '$prev', now requested by " +
        s"'$owner' — every mutable scratch path must be keyed by a query-unique kind")
    path
  }
}
