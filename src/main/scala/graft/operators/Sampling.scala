package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PolyHash

/** Sampling operators for training-data curation.
  *
  * `deterministicPerGroup` is the reproducible variant of stratified
  * sampling: each group keeps its `quota` rows with the smallest
  * content-hash, so the sample is a pure function of the data — stable
  * across runs, engines and cluster layouts (unlike `df.sample`, whose
  * output depends on partitioning). Runs as one partial-aggregating
  * bounded top-k per group (CollectTopK via Search-internal machinery is
  * overkill here; min-hash ordering + window-free aggregation). */
object Sampling {

  /** Keep `quota` rows per group, chosen by ascending rolling-hash of
    * `contentCol` (hash collisions broken by content, content ties by
    * `uniqueCol`). Deterministic and engine-replayable: without the
    * unique column, two rows with identical content but different
    * payloads tie exactly and which one survives would depend on
    * partition layout (ADVICE round-1). */
  def deterministicPerGroup(df: DataFrame, groupCol: String,
      contentCol: String, quota: Int, uniqueCol: String): DataFrame = {
    val h = PolyHash(col(contentCol), 31L)
    val payloadCols = df.columns.toSeq
    val item = struct(
      struct(h.as("__h"), col(contentCol).as("__c"), col(uniqueCol).as("__u")).as("__o"),
      struct(payloadCols.map(col): _*).as("__p"))
    df.groupBy(col(groupCol).as("__g"))
      .agg(Search.collectTopKPublic(item, quota).as("__arr"))
      .select(explode(col("__arr")).as("__e"))
      .select(payloadCols.map(c => col(s"__e.__p.$c").as(c)): _*)
  }

  /** Seeded uniform sample — thin wrapper documenting the tradeoff: fast
    * and distributed, but partition-layout dependent; use the
    * deterministic variant when reproducibility across engines matters. */
  def seededFraction(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)
}
