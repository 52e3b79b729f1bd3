package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — laying documents out into fixed-length training
  * sequences, the last mile of an LLM data pipeline. Two layouts:
  *
  *  - [[chunked]] — GPT-style concatenate-then-chunk: within a shard,
  *    documents are concatenated in deterministic hash order and the token
  *    stream is cut every `seqLen`; documents may span sequence
  *    boundaries (the trainer masks or accepts cross-doc attention).
  *    Pure window arithmetic over a running token sum — fully
  *    SQL-replayable, so it carries the DuckDB oracle. Sharding by id
  *    hash keeps the window PARTITIONED (no global sort): each shard is
  *    an independent token stream, which is exactly how multi-worker
  *    training data is laid out anyway.
  *  - [[ffd]] — padding-minimizing first-fit-decreasing bin packing:
  *    no document crosses a boundary; residual space is padding. Runs as
  *    sortWithinPartitions + mapPartitions (each partition packs its own
  *    bins greedily) — deterministic given the shard assignment, verified
  *    by property specs (assignment total, capacity, fill ratio) rather
  *    than a SQL oracle: FFD's bin state is inherently sequential and a
  *    recursive SQL replay would test the oracle, not the operator.
  */
object Packing {

  /** Concatenate-then-chunk layout. Returns one row per document:
    * (idCol, shard, seq_start, seq_end, offset) where `seq_start/seq_end`
    * are the first/last sequence indices the doc touches within its shard
    * and `offset` its token offset in `seq_start`. `spans = seq_end >
    * seq_start` marks boundary-crossing docs. */
  def chunked(df: DataFrame, idCol: String, tokenCol: String,
      seqLen: Int, shards: Int): DataFrame = {
    require(seqLen > 0 && shards > 0)
    Mixture.requireIntegralId(df, idCol, "Packing.chunked")
    val shard = pmod(Mixture.idHash(col(idCol)), lit(shards))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(Mixture.idHash(col(idCol)), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("shard", shard)
      .withColumn("__before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .select(col(idCol), col("shard"),
        (col("__before") / seqLen).cast("long").as("seq_start"),
        // a doc's last token sits at __before + nt - 1 (empty docs pin to
        // their start sequence rather than seq_start - 1)
        greatest((col("__before") + col(tokenCol) - 1) / seqLen,
          col("__before") / seqLen).cast("long").as("seq_end"),
        pmod(col("__before"), lit(seqLen.toLong)).as("offset"))
  }

  /** First-fit-decreasing packing of (id, tokens) into bins of `seqLen`.
    * Docs longer than `seqLen` are rejected up front (truncate or chunk
    * them first — silently dropping would under-report the corpus).
    * Shard-deterministic: rows are hash-sharded, each shard sorted by
    * (tokens desc, id) and packed greedily into its own bin namespace
    * (`shard · 2^40 + local`), so the layout is a pure function of the
    * data. Returns (shard, bin, doc_id, n_tokens). The first-fit scan is
    * linear in OPEN bins per doc — fine for seqLen ≫ median doc (few open
    * bins); an indexed free-space tree is the upgrade if profiles say so. */
  def ffd(df: DataFrame, idCol: String, tokenCol: String,
      seqLen: Int, shards: Int): DataFrame = {
    require(seqLen > 0 && shards > 0)
    Mixture.requireIntegralId(df, idCol, "Packing.ffd")
    val spark = df.sparkSession
    import spark.implicits._
    val over = df.filter(col(tokenCol) > seqLen).limit(1).collect()
    require(over.isEmpty,
      s"ffd: document longer than seqLen=$seqLen exists — chunk or truncate first")
    val prepared = df.select(
        pmod(Mixture.idHash(col(idCol)), lit(shards)).cast("int").as("shard"),
        col(idCol).cast("long").as("doc_id"),
        col(tokenCol).cast("long").as("n_tokens"))
      .repartition(math.min(shards, 2048), col("shard"))
      .sortWithinPartitions(col("shard"), col("n_tokens").desc, col("doc_id"))
      .as[(Int, Long, Long)]
    prepared.mapPartitions { it =>
      // several shards can land in one partition, but rows arrive
      // shard-contiguous (the sort's leading key) — so a shard change
      // flushes all open bins. Without the flush, completed shards' dead
      // bins accumulate and every doc pays a linear scan over ALL bins in
      // the partition (O(docs·bins)); with it the scan covers open bins of
      // the current shard only.
      val binsLeft = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (bin, left)
      var curShard = Int.MinValue
      var nextSeq = 0L
      it.map { case (shard, id, nt) =>
        if (shard != curShard) { binsLeft.clear(); curShard = shard; nextSeq = 0L }
        var i = 0
        var placed = -1L
        while (placed < 0 && i < binsLeft.length) {
          val (b, left) = binsLeft(i)
          if (left >= nt) { binsLeft(i) = (b, left - nt); placed = b }
          i += 1
        }
        val bin = if (placed >= 0) placed else {
          val b = shard.toLong * (1L << 40) + nextSeq
          nextSeq += 1
          binsLeft += ((b, seqLen.toLong - nt))
          b
        }
        (shard, bin, id, nt)
      }
    }.toDF("shard", "bin", "doc_id", "n_tokens")
  }
}
