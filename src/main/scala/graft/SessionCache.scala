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
  * dead (or, worse, silently foreign) frames. Entries owned by a
  * stopped session are evicted on the next cache access.
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

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, Any), Any]

  /** Memoize `f` under (spark, key). `key` should carry a
    * family-unique discriminator (e.g. `("ann", dir, tier)`) so
    * different callers can never collide on a bare dir string.
    */
  def getOrElseUpdate[T](spark: SparkSession, key: Any)(f: => T): T = {
    // frames owned by a stopped session can never be read again, and a
    // recreated session must rebuild, not inherit
    cache.keysIterator.filter(_._1.sparkContext.isStopped).toList
      .foreach(cache.remove)
    cache.getOrElseUpdate((spark, key), f).asInstanceOf[T]
  }

  /** Test hook: number of live entries. */
  private[graft] def size: Int = cache.size
}
