package graft.http

/** Per-executor lookup cache: LRU with max-rows + expire-after-write /
  * expire-after-access + cache-missing-key, mirroring Flink's PARTIAL lookup
  * cache options (reference docs `table/http.md` "Lookup Source Connector
  * Options": `lookup.cache`, `lookup.partial-cache.*`).
  *
  * Flink caches per parallel task; on Spark we share one cache per executor
  * JVM (all cores), keyed by the rendered request — strictly fewer external
  * calls at the same memory budget, which is the property that matters when
  * 1000 executors hammer one REST endpoint.
  *
  * Synchronized LinkedHashMap in access-order: O(1) get/put; eviction by
  * size and lazily by TTL on read. At the configured scale (`max-rows`,
  * default 1000 in Flink) contention is negligible versus network latency.
  */
final class LookupCache[V](
    maxRows: Long,
    expireAfterWriteMs: Option[Long],
    expireAfterAccessMs: Option[Long],
    clock: () => Long = () => System.currentTimeMillis()) {

  private final case class Entry(value: V, writeAt: Long, var accessAt: Long)

  private val map =
    new java.util.LinkedHashMap[String, Entry](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Entry]): Boolean = size() > maxRows
    }

  def get(key: String): Option[V] = map.synchronized {
    val e = map.get(key)
    if (e == null) None
    else {
      val now = clock()
      val expired =
        expireAfterWriteMs.exists(ttl => now - e.writeAt >= ttl) ||
          expireAfterAccessMs.exists(ttl => now - e.accessAt >= ttl)
      if (expired) { map.remove(key); None }
      else { e.accessAt = now; Some(e.value) }
    }
  }

  def put(key: String, value: V): Unit = map.synchronized {
    val now = clock()
    map.put(key, Entry(value, now, now))
  }

  def size: Int = map.synchronized(map.size())
}

object LookupCache {
  private val instances =
    new java.util.concurrent.ConcurrentHashMap[String, LookupCache[HttpOutcome]]()

  /** JVM-wide (per-executor) cache instance for a lookup config identity. */
  def shared(id: String, o: HttpOptions): Option[LookupCache[HttpOutcome]] =
    o.str(HttpOptions.LookupCacheKind, "NONE").toUpperCase match {
      case "NONE" => None
      case "PARTIAL" =>
        Some(instances.computeIfAbsent(
          id,
          _ =>
            new LookupCache[HttpOutcome](
              o.long(HttpOptions.CacheMaxRows, 1000L),
              o.strOpt(HttpOptions.CacheExpireAfterWrite)
                .map(HttpOptions.parseDurationMs),
              o.strOpt(HttpOptions.CacheExpireAfterAccess)
                .map(HttpOptions.parseDurationMs))))
      case other =>
        throw new HttpConfigException(s"Unknown lookup.cache kind '$other'")
    }

  /** Test hook. */
  private[graft] def clearAll(): Unit = instances.clear()
}
