package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class QueryCacheSpec extends SparkTestBase {

  import spark.implicits._

  private val cfg = SearchConfig(keyCols = Seq("id"))

  test("searchKey: deterministic, sensitive to query and config") {
    val q = Seq(1f, 2f)
    assert(QueryCache.searchKey(q, cfg) == QueryCache.searchKey(q, cfg))
    assert(QueryCache.searchKey(q, cfg) != QueryCache.searchKey(Seq(1f, 2.1f), cfg))
    assert(QueryCache.searchKey(q, cfg) != QueryCache.searchKey(q, cfg.copy(limit = 5)))
  }

  test("cached: computes once within TTL, recomputes after expiry; 0 bypasses") {
    QueryCache.clear()
    var clock = 1000L
    var computes = 0
    def run() = QueryCache.cached(Seq(1f), cfg, 10, () => clock) {
      computes += 1
      Seq((1L, 0.0)).toDF("id", "score")
    }
    run().count(); run().count()
    assert(computes == 1)
    clock += 11000
    run().count()
    assert(computes == 2)
    QueryCache.cached(Seq(1f), cfg, 0, () => clock) { computes += 1; Seq((1L, 0.0)).toDF("id", "score") }
    assert(computes == 3) // bypass
  }

  test("sweep evicts only expired entries") {
    QueryCache.clear()
    var clock = 1000L
    QueryCache.cached(Seq(1f), cfg, 5, () => clock)(Seq((1L, 0.0)).toDF("id", "score"))
    QueryCache.cached(Seq(2f), cfg, 500, () => clock)(Seq((2L, 0.0)).toDF("id", "score"))
    assert(QueryCache.size == 2)
    assert(QueryCache.sweep(clock + 6000) == 1)
    assert(QueryCache.size == 1)
    QueryCache.clear()
  }
}
