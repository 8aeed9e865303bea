package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped build-once cache — the shared backing for the
  * engine's materialized layers (dedup labels, LinUCB models, IVF
  * centroids, quality-model weights, prefix-scan frames). Keys are
  * (session, layer key); a listener evicts every entry belonging to a
  * session when its SparkContext ends, so a long-lived JVM that
  * creates and stops many sessions (test suites, notebook drivers)
  * never pins stopped sessions, their checkpointed RDDs, or model
  * arrays. */
final class SessionCache[K, V] {
  private val map =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, K), V]()
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  def getOrCompute(spark: SparkSession, key: K)(f: => V): V = {
    if (hooked.add(spark)) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          map.keySet.removeIf(_._1 eq spark)
          hooked.remove(spark)
        }
      })
    }
    val v = map.computeIfAbsent((spark, key), _ => f)
    // Eviction/insertion race: if the session stopped while f was
    // computing (or was already stopped on entry, so the listener will
    // never fire), the entry just inserted would be pinned forever —
    // drop it; the caller still gets its value.
    if (spark.sparkContext.isStopped) {
      map.remove((spark, key))
      hooked.remove(spark)
    }
    v
  }
}
