package graft.operators

/** Small synchronized LRU cache (access-ordered) for driver-side model /
  * layout handles — e.g. the IVF coarse quantizers a long-lived server
  * holds per corpus. Once `max` entries are cached, inserting a new one
  * evicts exactly the least-recently-used entry (never the whole map, so
  * hot corpora keep their models).
  */
private[graft] final class LruCache[K, V](max: Int) {
  require(max > 0, s"cache capacity must be positive, got $max")

  private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      this.size() > max
  }

  def getOrElseUpdate(key: K)(compute: => V): V = {
    map.synchronized {
      val hit = map.get(key)
      if (hit != null) return hit
    }
    // compute OUTSIDE the lock: a k-means fit can take seconds and must
    // not block lookups of other corpora. Two racing probes for the same
    // new corpus may both fit; last write wins — identical models (the
    // fit is deterministic), so correctness is unaffected.
    val v = compute
    map.synchronized {
      val prior = map.get(key)
      if (prior != null) prior
      else { map.put(key, v); v }
    }
  }

  def size: Int = map.synchronized(map.size())

  def contains(key: K): Boolean = map.synchronized(map.containsKey(key))

  def clear(): Unit = map.synchronized(map.clear())
}
