package graft.serve

/** T6 serving-result cache: TTL + LRU + ticker-prefix invalidation
  * (reference semantics: src/api/cache.py:68-193 — in-memory dict with
  * per-entry expiry, access-time LRU eviction at max_size, key =
  * `prefix:k=v:...` with md5 fallback for long keys, and
  * `invalidate_ticker` sweeping every key mentioning the ticker).
  *
  * This caches RENDERED serving payloads (JSON/CSV strings), never
  * DataFrames — the engine's own caching of distributed data is
  * `persist()`; this layer is the API-front hot-result store. Thread-safe
  * via a single lock (serving cache, not a data-plane structure). The
  * clock is injectable so TTL expiry is testable without sleeping.
  */
final class ResultCache(maxSize: Int = 1000, defaultTtlSeconds: Long = 3600,
                        clock: () => Long = () => System.currentTimeMillis()) {

  private final case class Entry(rawKey: String, value: String, expiresAt: Long)

  // access-order LinkedHashMap = LRU order for free; guarded by `this`.
  // Storage keys are md5-compacted when long (bounded map-key size, ref:
  // cache.py:55-67) but every Entry keeps its RAW key: invalidateTicker
  // parses entry raw keys, so compaction never hides an entry from
  // invalidation (the reference's substring sweep misses its hashed keys —
  // a staleness bug we do not reproduce).
  private val entries = new java.util.LinkedHashMap[String, Entry](64, 0.75f, true)
  private var hitCount = 0L
  private var missCount = 0L

  /** Deterministic cache key: prefix + sorted `k=v` params. */
  def key(prefix: String, params: (String, Any)*): String =
    s"$prefix:" + params.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(":")

  private def storageKey(raw: String): String =
    if (raw.length > 200) s"hash:${ResultCache.md5hex(raw)}" else raw

  def get(k: String): Option[String] = synchronized {
    val sk = storageKey(k)
    Option(entries.get(sk)) match {
      case Some(e) if clock() <= e.expiresAt =>
        hitCount += 1
        Some(e.value)
      case Some(_) =>
        entries.remove(sk)
        missCount += 1
        None
      case None =>
        missCount += 1
        None
    }
  }

  def put(k: String, v: String, ttlSeconds: Long = defaultTtlSeconds): Unit = synchronized {
    val sk = storageKey(k)
    if (entries.size >= maxSize && !entries.containsKey(sk)) {
      // evict the least-recently-used entry (head of access-order map)
      val it = entries.keySet().iterator()
      if (it.hasNext) { it.next(); it.remove() }
    }
    entries.put(sk, Entry(k, v, clock() + ttlSeconds * 1000L))
  }

  def getOrElseUpdate(k: String, ttlSeconds: Long = defaultTtlSeconds)(compute: => String): String =
    get(k).getOrElse {
      val v = compute // compute OUTSIDE the lock — may run Spark jobs
      put(k, v, ttlSeconds)
      v
    }

  /** Drop every entry whose key mentions the ticker, the reference's
    * invalidation unit (cache.py:242-255) — called after a refresh lands
    * new facts for that ticker. A key "mentions" a ticker when any of its
    * `k=v` segments has the ticker as a value or comma-list element —
    * precise (no substring false-positives on short tickers) and it also
    * catches multi-ticker comparison keys, which the reference's plain
    * `ticker={t}` substring test misses. */
  def invalidateTicker(ticker: String): Int = synchronized {
    val t = ticker.toUpperCase
    val it = entries.values().iterator()
    var removed = 0
    while (it.hasNext) {
      val hit = it.next().rawKey.split(':').exists { seg =>
        seg.split('=') match {
          case Array(_, v) => v.split(',').exists(_.equalsIgnoreCase(t))
          case _ => false
        }
      }
      if (hit) { it.remove(); removed += 1 }
    }
    removed
  }

  def clear(): Int = synchronized {
    val n = entries.size
    entries.clear()
    n
  }

  /** Drop every entry whose key was built with `prefix` (ResultCache.key's
    * first segment) — for store-WIDE aggregates (storage stats, ticker
    * census) that a per-ticker invalidation can never match but a data
    * change still staleness-breaks. */
  def invalidatePrefix(prefix: String): Int = synchronized {
    val it = entries.values().iterator()
    var removed = 0
    while (it.hasNext) {
      val raw = it.next().rawKey
      if (raw == prefix || raw.startsWith(s"$prefix:")) { it.remove(); removed += 1 }
    }
    removed
  }

  /** Expired-entry sweep (the reference runs one per minute in a loop;
    * here callers/schedulers invoke it explicitly). */
  def sweep(): Int = synchronized {
    val now = clock()
    val it = entries.values().iterator()
    var removed = 0
    while (it.hasNext) {
      if (now > it.next().expiresAt) { it.remove(); removed += 1 }
    }
    removed
  }

  def size: Int = synchronized(entries.size)

  def stats: Map[String, Any] = synchronized {
    Map(
      "total_entries" -> entries.size,
      "max_size" -> maxSize,
      "ttl_seconds" -> defaultTtlSeconds,
      "hits" -> hitCount,
      "misses" -> missCount,
      "cache_type" -> "in_memory")
  }
}

object ResultCache {
  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
