package graft

import org.apache.spark.sql.SparkSession

/** Process-lifetime memoization for the expensive shared artifacts the
  * driver faces would otherwise recompute per entry (ANN tier tables,
  * the dedup pair table, the mm codec output, BPE training, CDC state).
  *
  * Entries are keyed by the OWNING [[SparkSession]] in addition to the
  * logical key: the cached values are mostly
  * localCheckpoint-materialized frames, which are only valid inside the
  * session that created them — a stopped-and-recreated session in the
  * same JVM must rebuild its artifacts, never inherit another session's
  * dead (or, worse, silently foreign) frames.
  *
  * Lifetime of an entry = lifetime of its owning session, enforced two
  * ways: sessions whose SparkContext is stopped are evicted on the next
  * cache access, and the session key itself is held WEAKLY, so sibling
  * sessions created via `newSession()` (which share a live context and
  * would never trip the stopped-context check) release their artifacts
  * as soon as the session itself is unreachable. A long-lived service
  * that churns through sessions therefore does not accumulate
  * checkpointed frames — but note the reclaim is GC-timed, not
  * deterministic; a service that needs prompt artifact release should
  * prefer the uncached DataFrame faces.
  *
  * The per-key builder runs EXACTLY ONCE even under concurrent first
  * access: the map stores cheap lazy cells, so two racing callers may
  * both allocate a cell but force only the single cell that won
  * publication (a raced-and-lost builder would otherwise leak one
  * localCheckpoint).
  *
  * The caches deliberately do NOT watch the files under the keyed
  * directory: the driver faces exist for the one-shot verify/bench
  * driver, which reads immutable test data. Within one session, a
  * caller that mutates files under a cached dir must use the uncached
  * DataFrame faces (which take the input frame, not a dir) — those are
  * never memoized precisely because they cannot know their input's
  * identity.
  */
private[graft] object SessionCache {

  /** Allocation is cheap; the builder body runs only when the winning
    * cell is forced.
    */
  private final class Cell(f: () => Any) { lazy val value: Any = f() }

  private type PerSession = scala.collection.concurrent.TrieMap[Any, Cell]

  // weak session keys: an unreachable session's artifacts become
  // collectable with it, covering newSession() siblings that share a
  // live (so never "stopped") SparkContext
  private val cache =
    new java.util.WeakHashMap[SparkSession, PerSession]

  /** Memoize `f` under (spark, key). `key` should carry a
    * family-unique discriminator (e.g. `("ann", dir, tier)`) so
    * different callers can never collide on a bare dir string.
    */
  def getOrElseUpdate[T](spark: SparkSession, key: Any)(f: => T): T = {
    val perSession = cache.synchronized {
      // frames owned by a stopped session can never be read again, and
      // a recreated session must rebuild, not inherit
      val it = cache.entrySet().iterator()
      while (it.hasNext) if (it.next().getKey.sparkContext.isStopped) it.remove()
      var m = cache.get(spark)
      if (m == null) { m = scala.collection.concurrent.TrieMap.empty; cache.put(spark, m) }
      m
    }
    // TrieMap.getOrElseUpdate may allocate a losing Cell under a race,
    // but only the published cell is ever forced — single evaluation
    perSession.getOrElseUpdate(key, new Cell(() => f)).value.asInstanceOf[T]
  }

  /** Test hook: number of live entries across live sessions. */
  private[graft] def size: Int = cache.synchronized {
    var n = 0
    val it = cache.values().iterator()
    while (it.hasNext) n += it.next().size
    n
  }
}
