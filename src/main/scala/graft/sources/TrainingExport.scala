package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Training-shard export — the "ship it" step of a curation run: write
  * the corpus as `nShards` CONTIGUOUS slices of the deterministic global
  * shuffle order ([[Sampling.deterministicOrderIndex]] — a pure function
  * of the id set), so a trainer streams `shard=K` files in `pos` order
  * and reproduces the exact global example order, resumes from a
  * `(shard, pos)` bookmark, and scales data-parallel readers by handing
  * each rank `nShards / world_size` whole directories.
  *
  * Shard assignment is exact integer arithmetic, not a sampled
  * partitioner: `shard = pos · nShards / total` (floor) — sizes equal
  * within one row, boundaries reproducible by ANY engine from the id
  * set alone (the manifest oracle replays them in SQL). The write is one
  * range exchange on (shard, pos) + an in-file sort, the same cost class
  * as [[Layout.optimize]]; `pos` is persisted in the rows because a
  * resumable trainer needs it.
  *
  * Epoch variation composes upstream: shuffle a different epoch by
  * mixing it into the id before export (the
  * [[Sampling.deterministicOrderIndex]] contract). */
object TrainingExport {

  /** Write `df` under `dir` as `shard=K` directories; returns the shard
    * manifest (shard, n_rows, min_pos, max_pos) the caller can persist
    * or assert on. Rows gain a `pos` column; `total < nShards` leaves
    * the tail shards empty (no directory). */
  def exportShards(df: DataFrame, idCol: String, dir: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1 && nShards <= 100000, s"nShards=$nShards")
    require(!df.columns.contains("pos"),
      "exportShards writes the order position as column 'pos' — rename the existing one")
    require(!df.columns.contains("shard"),
      "exportShards writes the shard index as column 'shard' — rename the existing one")
    // duplicate ids would each take a DIFFERENT position and the join
    // back would multiply rows — refuse loudly (one narrow id-only agg,
    // the StreamingAttributes duplicate-guard convention)
    val dup = df.groupBy(col(idCol)).count()
      .filter(col("count") > 1).limit(1).count()
    require(dup == 0L,
      s"exportShards: duplicate values in id column '$idCol' — each copy " +
        "would take its own position and the join back would multiply rows; " +
        "dedup first")
    val ord = Sampling.deterministicOrderIndex(df.select(col(idCol)), idCol)
    val total = math.max(1L, ord.count()) // orderIndex is checkpointed: count is cheap
    // integer DIV, not `/`: Spark's `/` on longs is a DOUBLE divide, and
    // pos·nShards exceeds the 53-bit double mantissa on a large corpus —
    // a boundary row would land in the wrong shard silently
    val sharded = df.join(ord, idCol)
      .withColumn("shard",
        expr(s"CAST((pos * ${nShards}L) DIV ${total}L AS INT)"))
    sharded
      .repartitionByRange(nShards, col("shard"), col("pos"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    manifest(df.sparkSession, dir)
  }

  /** The shard manifest of a written export — per shard: row count and
    * the contiguous [min_pos, max_pos] slice it holds. One narrow scan. */
  def manifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        min("pos").as("min_pos"), max("pos").as("max_pos"))
}
