package graft.storage

/** JVM-wide byte-capped LRU for chunk payloads (the reference's
  * `CachingConfig.num_bytes_chunks`, config.rs:117-139 — its asset
  * manager keeps hot chunk bytes in memory; repeated point lookups and
  * hot-loop reads must not refetch from the object store).
  *
  * Safe because chunk objects are content-addressed and write-once: a
  * cached entry can never be stale (GC deletion only removes unreachable
  * ids). Keys include the store root so two repos in one JVM never alias.
  * One instance per JVM, shared by driver sessions and executor tasks;
  * capacity from `-Dgraft.chunkCache.bytes` (0 disables), default 256 MB.
  */
object ChunkCache {
  private val capacity: Long =
    java.lang.Long.getLong("graft.chunkCache.bytes", 256L * 1024 * 1024)

  private final case class Key(root: String, key: String, offset: Long,
                               length: Long)

  private val hitsCounter = new java.util.concurrent.atomic.AtomicLong
  private val missesCounter = new java.util.concurrent.atomic.AtomicLong
  private var bytes = 0L
  private val map = new java.util.LinkedHashMap[Key, Array[Byte]](
    1024, 0.75f, /* accessOrder = */ true)

  /** Fetch-through: serve `(key, offset, length)` of `store` from cache,
    * else load via `fetch` and remember it. Oversized payloads (> 1/8 of
    * capacity) and disabled caches pass straight through.
    *
    * `cacheable = false` bypasses the cache entirely — the BULK-SCAN
    * contract: a table scan reads every chunk exactly once per query
    * (and subdivided readers use per-partition sub-ranges that can never
    * repeat as keys), so caching it buys nothing, costs an extra copy
    * per chunk plus eviction churn under the shared lock, and evicts the
    * hot point-lookup entries the cache exists for. Scan paths pass
    * false; point-read paths (Session/Zarr chunk gets) cache.
    */
  def getOrFetch(store: Store, key: String, offset: Long, length: Long,
                 cacheable: Boolean = true)(
      fetch: => Array[Byte]): Array[Byte] = {
    if (capacity <= 0 || !cacheable) return fetch
    val k = Key(store.rootUri, key, offset, length)
    val hit = map.synchronized(map.get(k))
    if (hit != null) {
      hitsCounter.incrementAndGet()
      // defensive copy OUTSIDE the lock (cached arrays are never mutated
      // internally, so a lock-free read is safe): callers may mutate
      // returned chunk bytes (e.g. in-place decode); handing out the
      // cached array by reference would let one reader corrupt every
      // later reader of this key.
      return hit.clone()
    }
    missesCounter.incrementAndGet()
    val loaded = fetch
    if (loaded.length <= capacity / 8) {
      // cache a private copy (cloned before taking the lock): the
      // returned array is the caller's to mutate, the cached one must
      // stay pristine
      val copy = loaded.clone()
      map.synchronized {
        if (map.putIfAbsent(k, copy) == null) {
          bytes += copy.length
          // trigger LRU eviction down to the byte budget
          while (bytes > capacity && !map.isEmpty) {
            val it = map.entrySet().iterator()
            val eldest = it.next()
            bytes -= eldest.getValue.length
            it.remove()
          }
        }
      }
    }
    loaded
  }

  /** Cache-aware ranged read with storage-traffic accounting: serve from
    * cache when possible; on a miss issue one split ranged GET and invoke
    * `onMiss(fetchedBytes)` so callers can meter REAL storage traffic
    * (cache hits stay invisible to the meter — the reference's metrics
    * count object-store requests, not in-memory reads).
    */
  def read(store: Store, key: String, offset: Long, length: Long,
           onMiss: Long => Unit, cacheable: Boolean = true): Array[Byte] =
    getOrFetch(store, key, offset, length, cacheable) {
      val b = store.getRangeSplit(key, offset, length)
      onMiss(b.length.toLong)
      b
    }

  def hits: Long = hitsCounter.get()
  def misses: Long = missesCounter.get()
  def currentBytes: Long = map.synchronized(bytes)
  def clear(): Unit = map.synchronized { map.clear(); bytes = 0L }
}
