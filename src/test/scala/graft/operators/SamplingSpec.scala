package graft.operators

import graft.SparkTestBase

/** Deterministic order index: permutation, partition-count independence. */
class SamplingSpec extends SparkTestBase {

  import spark.implicits._

  test("deterministicOrderIndex: a permutation, independent of partitioning") {
    val ids = (0L until 500L).toDF("doc_id")
    val base = Sampling.deterministicOrderIndex(ids, "doc_id", partitions = 8)
      .as[(Long, Long)].collect().toMap
    // permutation of 0..n-1, every id present exactly once
    assert(base.size == 500)
    assert(base.values.toSeq.sorted == (0L until 500L))
    // the rank in a total order does not depend on where range boundaries
    // fall — different partition counts must give the identical mapping
    for (p <- Seq(1, 3, 17)) {
      val other = Sampling.deterministicOrderIndex(ids.repartition(5), "doc_id", partitions = p)
        .as[(Long, Long)].collect().toMap
      assert(other == base, s"order differs at partitions=$p")
    }
    // a downstream narrow coalesce (single-file write path) must not
    // perturb positions — regression for the task-id-vs-partition-id trap
    val coalesced = Sampling.deterministicOrderIndex(ids, "doc_id", partitions = 8)
      .coalesce(1).as[(Long, Long)].collect().toMap
    assert(coalesced == base, "coalesce(1) changed the order index")
  }

  test("deterministicOrderIndex rejects non-integral id columns up front") {
    val strIds = Seq("007", "1").toDF("doc_id")
    val e = intercept[IllegalArgumentException](
      Sampling.deterministicOrderIndex(strIds, "doc_id"))
    assert(e.getMessage.contains("integral id column"))
  }

  test("deterministicOrderIndex names the contract violation on a NULL id") {
    val withNull = Seq(Some(1L), None, Some(3L)).toDF("doc_id")
    val e = intercept[Exception](
      Sampling.deterministicOrderIndex(withNull, "doc_id").collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("NULL in id column")),
      s"expected the named contract error, got: ${e.getMessage}")
  }

  test("deterministicPerGroup: unorderable (map) payload takes the join-back path, same output") {
    import org.apache.spark.sql.functions._
    // uid is unique only WITHIN a group (the contract asks tie-breaking,
    // not global uniqueness): i/3 repeats across the three i%3 groups, so a
    // fallback joining on uid alone would admit other groups' rows
    val base = (1L to 60L).map(i =>
      (s"g${i % 3}", s"content-${i % 20}", i / 3)).toDF("grp", "text", "uid")
    val plain = Sampling.deterministicPerGroup(base, "grp", "text", 4, "uid")
      .select("grp", "text", "uid").as[(String, String, Long)].collect().toSet
    // same rows plus an unorderable map column: CollectTopK cannot order
    // the payload struct — the fallback must pick the IDENTICAL winners
    val withMap = base.withColumn("props", map(lit("k"), col("uid").cast("string")))
    val viaFallback = Sampling.deterministicPerGroup(withMap, "grp", "text", 4, "uid")
    assert(viaFallback.columns.toSeq ==  Seq("grp", "text", "uid", "props"))
    assert(viaFallback.select("grp", "text", "uid")
      .as[(String, String, Long)].collect().toSet == plain)
  }

  test("deterministicOrderIndex releases its working checkpoint (keeps only the result)") {
    val ids = (0L until 200L).toDF("doc_id")
    val before = spark.sparkContext.getPersistentRDDs.size
    Sampling.deterministicOrderIndex(ids, "doc_id", partitions = 4).count()
    val after = spark.sparkContext.getPersistentRDDs.size
    // the big (id, hash, partition) checkpoint must be gone; only the
    // small result checkpoint may remain
    assert(after - before <= 1, s"leaked checkpoints: $before -> $after")
  }

  test("splitByHash: deterministic, layout-independent, weight-proportional") {
    import spark.implicits._
    val ids = (0L until 2000L).toDF("id")
    val splits = Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1))
    val a = Sampling.splitByHash(ids, "id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    // layout independence: a different partitioning yields the same map
    val b = Sampling.splitByHash(ids.repartition(7), "id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a === b)
    // proportions approximate the weights (hash-uniformity, wide margin)
    val n = a.values.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(math.abs(n("train") - 1600) < 120, s"train ${n("train")}")
    assert(math.abs(n("valid") - 200) < 80, s"valid ${n("valid")}")
    assert(math.abs(n("test") - 200) < 80, s"test ${n("test")}")
    // membership is a pure function of the id: a subset assigns identically
    val c = Sampling.splitByHash(ids.filter($"id" < 100), "id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    c.foreach { case (id, sp) => assert(a(id) === sp) }
    // guards
    intercept[IllegalArgumentException](
      Sampling.splitByHash(ids, "id", Seq(("a", 0.5), ("a", 0.5))))
    intercept[IllegalArgumentException](
      Sampling.splitByHash(ids, "id", Seq(("a", -1.0))))
  }
}
