package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** VERDICT r4 #1: `jaccardPairsPrefix` used to compute shingle df with
  * `count(*) over Window.partitionBy("h")` — a window exchange puts every
  * inverted-index row of one shingle hash in ONE task, and on the df-skewed
  * corpora the prefix plan exists for (a boilerplate shingle in 35% of
  * docs) that task is the straggler AQE cannot touch (OptimizeSkewedJoin
  * applies to joins, never window exchanges). The df stage is now a
  * `groupBy("h").count()` joined back, which AQE CAN skew-split
  * (SkewProbeSpec proves the mechanism on hinted SHJ). This spec pins the
  * fix structurally AND behaviorally:
  *  - the executed prefix plan contains no Window exchange at all;
  *  - output parity with the inverted plan is unchanged on a corpus with
  *    a hot shingle universe (r13: including under the PPJoin positional
  *    candidate filter and the candidate-pruned verify — the r12 form of
  *    this spec also asserted `skew=true` on the then-corpus-sized verify
  *    join; r13 checkpoints the candidate table and prunes the verify to
  *    candidate docs, so that join is no longer in the final plan and no
  *    longer big enough to need skew-splitting — the df join that
  *    motivated this spec executes inside the sets checkpoint, where
  *    SkewProbeSpec's mechanism proof applies). */
class PrefixDfSkewSpec extends SparkTestBase {

  import spark.implicits._

  test("prefix df stage: no window exchange; hot shingle hash skew-splits; parity holds") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1B",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64B",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.shuffle.partitions" -> "32",
      // the checkpointed inverted index must keep many map partitions or a
      // single-mapper hot partition cannot split (see SkewProbeSpec)
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // the compact (h, df) side must not broadcast or there is no
      // shuffle join to split at this scale
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 150 docs share a hot 5-token footer (its 3 shingles have df=150);
      // each doc also has a unique body so docs are not all near-dups,
      // plus 20 true near-dup pairs to keep the output non-trivial
      val footer = "all rights reserved footer text"
      val docs = (
        (0L until 150L).map(i => (i, s"body${i}a body${i}b body${i}c body${i}d $footer")) ++
        (0L until 20L).map(i => (1000L + i, s"body${i}a body${i}b body${i}c body${i}d $footer extra"))
      ).toDF("doc_id", "text").repartition(16).localCheckpoint(true)
      val pairs = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", n = 3, threshold = 0.5)
      pairs.queryExecution.toRdd.count() // finalize AQE stages
      val plan = pairs.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"prefix plan still contains a window exchange:\n${plan.take(4000)}")
      // parity: same output as the inverted plan on the same corpus
      val got = pairs.select("id_a", "id_b", "jaccard").collect().toSet
      val want = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
        .select("id_a", "id_b", "jaccard").collect().toSet
      assert(got == want, s"plans diverged: ${got.size} vs ${want.size} pairs")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
