package graft

import scala.util.control.NonFatal

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped build-once cache — the shared backing for the
  * engine's materialized layers (dedup labels, LinUCB models, IVF
  * centroids, quality-model weights, prefix-scan frames).
  *
  * BOUNDED: each session holds at most `maxEntries` values in
  * least-recently-used order — a long-lived context that touches many
  * (sfDir, param) variants (test suites, notebook drivers, multi-lake
  * jobs) evicts cold layers instead of pinning every variant for the
  * context lifetime. Eviction calls `onEvict` (e.g.
  * [[SessionCache.unpersistCheckpoint]] for localCheckpoint-backed
  * frames, releasing their executor blocks eagerly instead of waiting
  * for the context to end); a listener additionally drops a session's
  * entries when its SparkContext stops, so stopped sessions never pin
  * checkpointed RDDs or model arrays.
  *
  * CONTRACT: a cached layer is valid while RESIDENT. Consumers re-enter
  * through the layer getter (e.g. `Dedup.materializedClusters`) — an
  * evicted entry rebuilds transparently on next GETTER access. A
  * DataFrame reference held privately across `maxEntries` later layer
  * builds in the same session may lose its blocks to eviction, and a
  * checkpoint-backed frame FAILS if acted on after that (truncated
  * lineage cannot recompute) — hold the getter, not the frame. Keys assume the
  * data under a given key (sfDir, plan) is immutable for the session —
  * an in-place lake refresh mid-session invalidates every memoized
  * layer, the standard warehouse snapshot assumption.
  *
  * Concurrency: cache hits never block on an in-flight build; builds
  * for the SAME key are serialized on a per-key latch (a displaced-
  * latch race can rarely build twice — the loser's value is discarded
  * and released via `onEvict`, the winner's is what every caller
  * sees), builds for different keys run concurrently. */
final class SessionCache[K, V](maxEntries: Int = 16,
                               onEvict: V => Unit = (_: V) => ()) {
  require(maxEntries >= 1, s"maxEntries must be >= 1, got $maxEntries")

  private val sessions = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.LinkedHashMap[K, V]]()
  private val building =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, K), Object]()

  private def evictQuietly(spark: SparkSession, v: V): Unit =
    try if (!spark.sparkContext.isStopped) onEvict(v)
    catch {
      case e: InterruptedException =>
        Thread.currentThread().interrupt()
        System.err.println(s"[SessionCache] eviction interrupted: $e")
      case NonFatal(e) =>
        System.err.println(s"[SessionCache] onEvict failed (blocks may stay pinned): $e")
    }

  private def mapFor(spark: SparkSession) =
    sessions.computeIfAbsent(spark, s => {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          sessions.remove(s): Unit // context gone — blocks already freed
        }
      })
      // access-order LinkedHashMap = LRU
      new java.util.LinkedHashMap[K, V](8, 0.75f, true)
    })

  def getOrCompute(spark: SparkSession, key: K)(f: => V): V = {
    val m = mapFor(spark)
    // fast path: hits take the map lock only briefly (get also refreshes
    // LRU order, so it must run under the lock)
    val hit = m.synchronized(m.get(key))
    val v =
      if (hit != null) hit
      else {
        // build OUTSIDE the map lock so hits and other-key builds never
        // wait; same-key racers serialize on a per-key latch and the
        // loser reuses the winner's value (build-once preserved)
        val latch = building.computeIfAbsent((spark, key), _ => new Object)
        try latch.synchronized {
          val again = m.synchronized(m.get(key))
          if (again != null) again
          else {
            val computed = f
            m.synchronized {
              // displaced-latch race (builder finished + removed the
              // latch while we were acquiring it, then a newcomer
              // re-created it): if a value landed meanwhile, keep the
              // resident one and RELEASE ours — a silent put would
              // displace it with no onEvict, pinning its blocks forever
              val existing = m.get(key)
              if (existing != null) {
                evictQuietly(spark, computed)
                existing
              } else {
                m.put(key, computed)
                while (m.size > maxEntries) {
                  val it = m.entrySet().iterator()
                  val eldest = it.next()
                  it.remove()
                  evictQuietly(spark, eldest.getValue)
                }
                computed
              }
            }
          }
        } finally building.remove((spark, key)): Unit
      }
    // Eviction/insertion race: if the session stopped while f was
    // computing (or was already stopped on entry, so the listener will
    // never fire), the entry just inserted would be pinned forever —
    // drop the whole session map; the caller still gets its value.
    if (spark.sparkContext.isStopped) sessions.remove(spark)
    v
  }
}

object SessionCache {
  /** Eagerly release the executor blocks behind a `localCheckpoint`ed
    * frame — the eviction hook for DataFrame-valued layers. A
    * checkpointed Dataset's plan is a [[org.apache.spark.sql.execution.LogicalRDD]]
    * leaf over the persisted RDD; unpersisting it frees the blocks now
    * rather than at context end (dropping the map reference alone
    * leaves them pinned until the ContextCleaner notices, which for a
    * long-lived session is never). Non-blocking; safe on plans with no
    * checkpoint (no-op). */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false): Unit
      case _ => ()
    }
}
