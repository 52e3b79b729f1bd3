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
}
