package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[BudgetedSearch]] — the opt-in timeout-bounded best-effort search
  * (VERDICT r4 #7): within the budget it equals the deterministic path;
  * past it, it returns the exact top-k over a documented subset, within
  * the budget plus scheduling slack. */
class BudgetedSearchSpec extends SparkTestBase {

  import spark.implicits._

  private def corpus(n: Int) = (0 until n)
    .map(i => (i.toLong, Array.tabulate(4)(d => (i * 4 + d).toFloat)))
    .toDF("vec_id", "feature")

  private def cfg = SearchConfig(
    scoreFuncName = "VectorDistance", higherIsBetter = false, limit = 5,
    featureCol = "feature", keyCols = Seq("vec_id"), tieBreakCol = Some("vec_id"),
    assumeUniqueKeys = true)

  test("ample budget: complete scan, rows equal the deterministic search") {
    val data = corpus(500).repartition(8)
    val q = Seq(10f, 11f, 12f, 13f)
    val r = BudgetedSearch.search(data, q, cfg, budgetMs = 120000L)
    assert(r.complete && r.scannedPartitions == r.totalPartitions)
    val got = r.rows.select("vec_id", Search.ScoreCol)
      .as[(Long, Double)].collect().toSeq
    val want = Search.search(data, q, cfg).select("vec_id", Search.ScoreCol)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, s"got $got want $want")
  }

  test("ample budget, multi: equals deterministic multiSearch per query") {
    val data = corpus(300).repartition(8)
    val queries = corpus(300).filter($"vec_id" < 10)
      .select($"vec_id".as(Search.QueryIdCol), $"feature")
    val r = BudgetedSearch.multiSearch(data, queries, cfg, budgetMs = 120000L)
    assert(r.complete)
    val got = r.rows.select(Search.QueryIdCol, "vec_id")
      .as[(Long, Long)].collect().toSet
    val want = Search.multiSearch(data, queries, cfg)
      .select(Search.QueryIdCol, "vec_id").as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("dedup semantics survive the driver merge (duplicate keys, best kept)") {
    // two rows per vec_id with different features -> different scores;
    // without assumeUniqueKeys the merge must keep the better one
    val dup = corpus(100).unionByName(
      corpus(100).withColumn("feature",
        transform($"feature", x => x + 1000f)))
      .repartition(6)
    val q = Seq(10f, 11f, 12f, 13f)
    val c = cfg.copy(assumeUniqueKeys = false)
    val r = BudgetedSearch.search(dup, q, c, budgetMs = 120000L)
    assert(r.complete)
    val got = r.rows.select("vec_id", Search.ScoreCol)
      .as[(Long, Double)].collect().toSeq
    val want = Search.search(dup, q, c).select("vec_id", Search.ScoreCol)
      .as[(Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("expired budget: partial subset, exact over scanned partitions, bounded time") {
    // each partition sleeps ~400 ms inside the scan; 8 partitions, budget
    // 700 ms with batches of 2 -> only the first batch(es) complete
    val slow = corpus(80).repartition(8)
      .as[(Long, Array[Float])]
      .mapPartitions { it => Thread.sleep(400); it }
      .toDF("vec_id", "feature")
    val q = Seq(0f, 1f, 2f, 3f)
    val t0 = System.nanoTime()
    val r = BudgetedSearch.search(slow, q, cfg, budgetMs = 700L,
      batchPartitions = 2)
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(!r.complete, s"scanned ${r.scannedPartitions}/${r.totalPartitions}")
    assert(r.scannedPartitions < r.totalPartitions)
    // bounded: budget + one in-flight batch + scheduling slack, far under
    // a full serial scan (8 x 400 ms in 4 sequential local batches)
    assert(elapsedMs < 2500, s"took $elapsedMs ms")
    // every returned row is a REAL row with its true score, sorted, <= k
    val rows = r.rows.select("vec_id", Search.ScoreCol).as[(Long, Double)].collect()
    assert(rows.length <= 5)
    assert(rows.sortBy(_._2).toSeq == rows.toSeq)
    val truth = Search.search(corpus(80), q, cfg.copy(limit = 80))
      .select("vec_id", Search.ScoreCol).as[(Long, Double)].collect().toMap
    rows.foreach { case (id, s) => assert(truth(id) == s, s"row $id score $s") }
  }

  test("grouped top-k is refused loudly") {
    val e = intercept[IllegalArgumentException](
      BudgetedSearch.search(corpus(10), Seq(0f, 1f, 2f, 3f),
        cfg.copy(groupLimit = 3), budgetMs = 1000L))
    assert(e.getMessage.contains("deterministic"))
  }
}
