package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each area of the operator inventory (SURVEY §2) contributes its queries
  * and DuckDB oracles from a `graft.queries.*Queries` object. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    KnnQueries.defs("knn_l2")(spark, "/root/testdata/sf0.001")

  private def areas = Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])](
    (KnnQueries.defs, KnnQueries.oracle),
    (StatsQueries.defs, StatsQueries.oracle),
    (TextQueries.defs, TextQueries.oracle),
    (DedupQueries.defs, DedupQueries.oracle),
    (IngestQueries.defs, IngestQueries.oracle),
    (FilterQueries.defs, FilterQueries.oracle),
    (AnnQueries.defs, AnnQueries.oracle),
    (MultimodalQueries.defs, MultimodalQueries.oracle),
    (EventQueries.defs, EventQueries.oracle),
    (SamplingQueries.defs, SamplingQueries.oracle),
    (SkewQueries.defs, SkewQueries.oracle),
    (MixQueries.defs, MixQueries.oracle),
    (RelationalQueries.defs, RelationalQueries.oracle),
    (RetrievalQueries.defs, RetrievalQueries.oracle),
    (ClusterQueries.defs, ClusterQueries.oracle),
    (LmQueries.defs, LmQueries.oracle),
    (BpeQueries.defs, BpeQueries.oracle),
    (DsirQueries.defs, DsirQueries.oracle),
    (ChunkQueries.defs, ChunkQueries.oracle),
    (LayoutQueries.defs, LayoutQueries.oracle),
    (AsofQueries.defs, AsofQueries.oracle),
    (SketchQueries.defs, SketchQueries.oracle),
    (UrlQueries.defs, UrlQueries.oracle),
    (AttrQueries.defs, AttrQueries.oracle),
    (DiffQueries.defs, DiffQueries.oracle),
    (LidQueries.defs, LidQueries.oracle),
    (SpmQueries.defs, SpmQueries.oracle))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    areas.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    areas.map(_._2).reduce(_ ++ _)
}
