package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped memo: values cached per (SparkSession instance, key).
  * The key carries the SESSION's identity, not just the application id: a
  * cached DataFrame is bound to the SparkSession that resolved it, so a
  * sibling session sharing the SparkContext (`spark.newSession`) must
  * compute its own entry rather than receive a frame resolved against
  * another session. Entries belonging to OTHER applications are evicted
  * on access, so a JVM that cycles sessions (test suites, long-lived
  * benches) cannot pin a stopped session's plans/object graph — the cache
  * never outgrows the live application's keys. Values are still keyed by
  * the caller's `key` (typically a fixture dir): a fixture REWRITTEN in
  * place within one session returns the stale memo — content-versioned
  * reuse lives in [[graft.operators.DedupPipeline]]-style artifacts, not
  * here.
  */
private[graft] final class SessionCache[V] {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, V]()

  def getOrCompute(spark: SparkSession, key: String)(compute: => V): V = {
    val app = spark.sparkContext.applicationId
    val session = app + "|" + System.identityHashCode(spark).toHexString
    val it = m.keySet().iterator()
    while (it.hasNext) if (!it.next().startsWith(app + "|")) it.remove()
    m.computeIfAbsent(session + "|" + key, _ => compute)
  }
}
