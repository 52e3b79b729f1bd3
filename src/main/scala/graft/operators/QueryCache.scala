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
    * unset cacheDuration.
    *
    * `compute` runs OUTSIDE any map lock: ConcurrentHashMap.compute holds
    * the bin lock for the remapping function's duration and forbids
    * touching the map from inside it — a nested cached() call (re-score
    * over a cached candidate set) would deadlock, and unrelated keys in
    * the same bin would stall behind the user's plan construction. The
    * cost is a benign race: two concurrent misses may both compute, one
    * result wins the putIfAbsent and the loser unpersists its copy.
    * A sweep of expired entries piggybacks on every call (amortized; the
    * reference runs its sweep on a timer, data/search.go:235-239). */
  def cached(query: Seq[Float], cfg: SearchConfig, cacheDurationSeconds: Long,
      nowMs: () => Long = () => System.currentTimeMillis())(
      compute: => DataFrame): DataFrame = {
    if (cacheDurationSeconds <= 0) return compute
    val key = searchKey(query, cfg)
    val now = nowMs()
    sweep(now)
    val first = cache.get(key)
    if (first != null && first.expiresAtMs > now) return first.df
    val fresh = Entry(compute.persist(), now + cacheDurationSeconds * 1000)
    // Spark's CacheManager keys persistence by LOGICAL PLAN, and equal
    // cache keys produce structurally equal plans — so two racers' `df`s
    // share ONE storage entry, and unpersisting the loser would evict the
    // winner's data while its map entry keeps "serving" it (every hit
    // would silently recompute). Release only when the plans genuinely
    // differ; a shared plan stays tracked through the surviving map entry.
    def release(df: DataFrame, keeper: DataFrame): Unit =
      if (!df.queryExecution.analyzed.sameResult(keeper.queryExecution.analyzed))
        df.unpersist()
    // install loop: `fresh` must end up either IN the map (tracked, so
    // sweep/clear will unpersist it) or released in favor of a LIVE
    // winner. The earlier single-attempt version could lose a replace race
    // to an expired/swept entry and return fresh untracked — persisted
    // blocks nothing would ever release.
    @scala.annotation.tailrec
    def install(): DataFrame = cache.get(key) match {
      case live if live != null && live.expiresAtMs > now =>
        release(fresh.df, live.df); live.df // someone else won with a live entry
      case null =>
        if (cache.putIfAbsent(key, fresh) == null) fresh.df else install()
      case expired =>
        if (cache.replace(key, expired, fresh)) { release(expired.df, fresh.df); fresh.df }
        else install()
    }
    install()
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
