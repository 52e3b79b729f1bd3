package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Skew robustness of the hinted band self-joins (VERDICT round-3 #7).
  *
  * The minhash/cosine/simhash band joins pin `shuffle_hash` (band keys
  * have no sort value). The open question was whether a HOT band bucket —
  * one (band, bkey) shared by thousands of rows — serializes its whole
  * m² candidate blowup through a single task, since join-strategy hints
  * pin the strategy. Measured answer on this Spark version: NO —
  * AQE's OptimizeSkewedJoin applies to hinted shuffled-hash joins too
  * (`ShuffledHashJoin(skew=true)` + `AQEShuffleRead coalesced and
  * skewed` in the final plan, including through the ReusedExchange the
  * checkpointed self-join sides produce). The hot partition splits by
  * mapper ranges; the matching build partition is duplicated per split.
  *
  * One real constraint surfaced by this probe: the split granularity is
  * MAPPER ranges, so a skewed reduce partition fed by a single map
  * partition cannot split at all — OptimizeSkewedJoin counts it
  * non-skewed ("number of skewed partitions: 0") and leaves the plan
  * alone. At test scale that single mapper is exactly what AQE's own
  * partition coalescing produces on a tiny upstream aggregate (the
  * checkpointed band-key RDD collapses to 1 partition), which is why
  * this fixture pins coalescing OFF while building the fixture; at the
  * 100-TB target the upstream has thousands of mappers and the split
  * applies as measured here.
  *
  * Interplay with the caps, documented here once for all three joins:
  * `maxShingleDf` bounds Jaccard inverted-index bucket sizes a priori;
  * band buckets have no such cap (a bucket of near-identical docs is
  * REAL signal), so their skew path is exactly this AQE split, governed
  * by `spark.sql.adaptive.skewJoin.*` — at production defaults a bucket
  * only splits past 256 MB / 5× median, i.e. precisely the single-task
  * blowups the verdict worried about. */
class SkewProbeSpec extends SparkTestBase {

  import spark.implicits._

  test("hot band bucket: hinted SHJ is skew-split by AQE, pairs stay exact") {
    // tiny AQE thresholds stand in for the 256MB production default —
    // the fixture's hot bucket is hot relative to THESE
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1B",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64B",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      // enough initial partitions that the 4 hot band buckets don't BECOME
      // the median of the histogram (skew is relative to the median)
      "spark.sql.shuffle.partitions" -> "32",
      // keep the checkpointed band-key RDD at 32 map partitions: with
      // coalescing on, AQE collapses the tiny signature aggregate to ONE
      // partition, and a single-mapper hot bucket cannot be split (see
      // scaladoc) — the probe would then measure the fixture, not the rule
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 200 IDENTICAL docs = every band key equal = one hot bucket per
      // band; 100 background docs with disjoint token universes
      val hotText = (1 to 40).map(i => s"tok$i").mkString(" ")
      val docs = (
        (0L until 200L).map(i => (i, hotText)) ++
        (200L until 300L).map(i => (i, (1 to 10).map(j => s"bg${i}w$j").mkString(" ")))
      ).toDF("doc_id", "text")
      val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        n = 3, bands = 4, threshold = 0.9)
      pairs.queryExecution.toRdd.count() // finalize AQE stages of THIS plan
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin(skew=true)"),
        s"hot band bucket was not skew-split:\n${plan.take(4000)}")
      // and the split changes nothing semantically: all C(200,2) identical
      // pairs survive the exact verify, background docs pair with nothing
      val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect()
      assert(got.length == 200 * 199 / 2, s"got ${got.length} pairs")
      assert(got.forall { case (a, b) => a < 200 && b < 200 && a < b })
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
