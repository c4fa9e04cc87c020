package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped memo: values cached per (Spark application, key).
  * Entries belonging to OTHER applications are evicted on access, so a
  * JVM that cycles sessions (test suites, long-lived benches) cannot pin
  * a stopped session's plans/object graph — the cache never outgrows the
  * live application's keys.
  */
private[graft] final class SessionCache[V] {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, V]()

  def getOrCompute(spark: SparkSession, key: String)(compute: => V): V = {
    val app = spark.sparkContext.applicationId
    val it = m.keySet().iterator()
    while (it.hasNext) if (!it.next().startsWith(app + "|")) it.remove()
    m.computeIfAbsent(app + "|" + key, _ => compute)
  }
}
