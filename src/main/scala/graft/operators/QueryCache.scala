package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's query-result cache (SURVEY.md §2.3 E8 + §2.4 J3):
  * results keyed by (query vector, search config), valid for a TTL
  * (data/search.go:151-158, 169-183, 235-239).
  *
  * The key is content-derived like `GetSearchKey` (serialized query key +
  * JSON of the config minus its uuid): here sha-256 over the query vector
  * bits and the case-class config rendering — deterministic across JVMs.
  * Cached results are persisted DataFrames; eviction unpersists. */
object QueryCache {

  /** E8: deterministic cache key for (query, config). */
  def searchKey(query: Seq[Float], cfg: SearchConfig): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    query.foreach(f => md.update(
      java.nio.ByteBuffer.allocate(4).putInt(java.lang.Float.floatToIntBits(f)).array()))
    md.update(cfg.toString.getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  private final case class Entry(df: DataFrame, expiresAtMs: Long)
  private val cache = new ConcurrentHashMap[String, Entry]()

  /** Compute-through cache: returns the cached (persisted) result when the
    * key is live, else runs `compute`, persists and caches it.
    * `cacheDurationSeconds <= 0` bypasses caching like the reference's
    * unset cacheDuration. */
  def cached(query: Seq[Float], cfg: SearchConfig, cacheDurationSeconds: Long,
      nowMs: () => Long = () => System.currentTimeMillis())(
      compute: => DataFrame): DataFrame = {
    if (cacheDurationSeconds <= 0) return compute
    val key = searchKey(query, cfg)
    val now = nowMs()
    val live = cache.compute(key, (_, e) =>
      if (e != null && e.expiresAtMs > now) e
      else {
        if (e != null) e.df.unpersist()
        Entry(compute.persist(), now + cacheDurationSeconds * 1000)
      })
    live.df
  }

  /** Drop expired entries (the reference's periodic cache sweep). */
  def sweep(nowMs: Long = System.currentTimeMillis()): Int = {
    var evicted = 0
    cache.forEach { (k, e) =>
      if (e.expiresAtMs <= nowMs && cache.remove(k, e)) {
        e.df.unpersist(); evicted += 1
      }
    }
    evicted
  }

  def size: Int = cache.size()
  def clear(): Unit = { cache.forEach((_, e) => e.df.unpersist()); cache.clear() }
}
