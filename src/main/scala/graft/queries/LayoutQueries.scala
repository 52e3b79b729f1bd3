package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Write-path layout optimization ([[graft.sources.Layout]]) as a
  * driver-verifiable query: rewrite `documents` into the two-layer
  * pruned layout (directories by `lang`, files range-split + sorted on
  * `n_chars`), then run a selective scan over it. The AGGREGATE columns
  * replay exactly in DuckDB against the RAW table (a layout rewrite
  * must never change query results); the two pruning booleans are
  * in-query plan evidence — the filter must reach the scan as
  * `PartitionFilters` (directory pruning) and `PushedFilters`
  * (row-group footer skipping), not evaluate post-read. */
object LayoutQueries {

  private val cache = TrieMap.empty[(SparkSession, String), String]

  private def layoutDir(s: SparkSession, dir: String): String =
    cache.getOrElseUpdate((s, dir), {
      val out = "/tmp/graft_layout/" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
        AnnQueries.sourceFingerprint(s"$dir/documents.parquet")
      if (!new java.io.File(s"$out/_SUCCESS").exists()) {
        Layout.optimize(Tables(s, dir, "documents"), out,
          partitionCols = Seq("lang"), sortCols = Seq("n_chars"))
      }
      out
    })

  private def prunedScan(s: SparkSession, dir: String): DataFrame = {
    val scan = Layout.read(s, layoutDir(s, dir))
      .filter(col("lang") === "en" &&
        col("n_chars").between(100L, 400L))
    val (partitionPruned, filtersPushed) = Layout.pruning(scan)
    scan.agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"))
      .withColumn("partition_pruned", lit(partitionPruned))
      .withColumn("filters_pushed", lit(filtersPushed))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_pruned_scan" -> (prunedScan _))

  def oracle: Map[String, String] = Map(
    "layout_pruned_scan" ->
      """SELECT count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
        |       min(n_chars)::BIGINT AS min_chars,
        |       max(n_chars)::BIGINT AS max_chars,
        |       TRUE AS partition_pruned, TRUE AS filters_pushed
        |FROM documents
        |WHERE lang = 'en' AND n_chars BETWEEN 100 AND 400""".stripMargin)
}
