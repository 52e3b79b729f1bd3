package graft.model

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's `Dataset` catalog (SURVEY.md §2.1 S3/S5): named datasets
  * with `DataConfig` properties, persisted as JSON lines (the `index.save`
  * analog, data/dataset.go:166-227).
  *
  * Datasets are path-based parquet tables under `rootDir/<name>`; the
  * catalog only tracks configs — data placement, replication and
  * durability are the storage layer's job in Spark (HDFS/object store),
  * which is why the reference's replication knobs are carried as inert
  * properties.
  */
final class DatasetCatalog(spark: SparkSession, rootDir: String) {

  private val configs = TrieMap.empty[String, DataConfig]

  private def indexPath = Paths.get(rootDir, "index.save.jsonl")
  private def dataPath(name: String) = s"$rootDir/data/$name"

  /** Create-or-upgrade semantics of CreateDataIfNotExists
    * (data/dataset.go:107-130): a config with a strictly newer version
    * replaces the stored one; same-or-older versions are ignored. */
  def createIfNotExists(cfg: DataConfig): DataConfig = {
    val effective = withDefaults(cfg)
    configs.get(cfg.name) match {
      case Some(existing) if cfg.version <= existing.version => existing
      case _ => configs.put(cfg.name, effective); effective
    }
  }

  /** Get-with-auto-create (data/dataset.go:65-75): unknown names get the
    * default config, like the reference's insert path. */
  def getOrCreate(name: String): DataConfig =
    configs.getOrElseUpdate(name, withDefaults(DataConfig(name)))

  /** GetNoCreate (data/dataset.go:88-97). */
  def get(name: String): Option[DataConfig] = configs.get(name)

  def list: Seq[DataConfig] = configs.values.toSeq.sortBy(_.name)

  def drop(name: String): Unit = configs.remove(name)

  /** retention 0 → 14 days (data/dataset.go:58-63). */
  private def withDefaults(cfg: DataConfig): DataConfig =
    if (cfg.retentionDays <= 0) cfg.copy(retentionDays = 14) else cfg

  /** Read a dataset's table (empty Datum-schema table when never written). */
  def table(name: String): DataFrame = {
    getOrCreate(name)
    val p = dataPath(name)
    if (Files.exists(Paths.get(p))) spark.read.parquet(p)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Datum.schema)
  }

  // ------------------------------------------------------------- row stats

  /** Live row count per dataset, maintained on every write — the
    * reference keeps N incrementally (data/data.go:54) so its capacity
    * gate is O(1); ours reads parquet FOOTERS once per write (a
    * metadata-only count, no data scan) and serves the gate from memory.
    * See [[graft.operators.Ingest.IngestConfig.currentN]]. */
  private val rowCounts = TrieMap.empty[String, Long]

  def rowCount(name: String): Option[Long] = rowCounts.get(name)

  private def refreshCount(name: String): Unit =
    rowCounts.put(name, spark.read.parquet(dataPath(name)).count())

  def write(name: String, df: DataFrame): Unit = {
    getOrCreate(name)
    df.write.mode("overwrite").parquet(dataPath(name))
    refreshCount(name)
  }

  /** S1 read-modify-write insert path: gate on the tracked count (no scan),
    * merge, persist, refresh the stat. A batch the capacity gate rejects
    * touches NOTHING — no checkpoint, no rewrite of identical data (a
    * rejected insert must never open a crash window over the stored
    * table). The merged frame is checkpointed before the overwrite —
    * Spark cannot overwrite a path it is lazily reading from. */
  def upsertInto(name: String, updates: DataFrame,
      cfg: graft.operators.Ingest.IngestConfig): Unit = {
    val n = rowCount(name)
    if (!cfg.noTarget && n.exists(_ >= cfg.targetN)) return
    val merged = graft.operators.Ingest
      .upsert(table(name), updates, cfg.copy(currentN = n))
      .localCheckpoint(true)
    write(name, merged)
  }

  /** Write a dataset hive-partitioned by `partitionCol` — the layout for
    * low-cardinality routing keys (IVF cluster ids): equality/IN filters
    * prune whole directories unconditionally (PartitionFilters on the
    * scan), so an nProbe search reads nProbe/k of the table. */
  def writePartitioned(name: String, df: DataFrame, partitionCol: String): Unit = {
    getOrCreate(name)
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(dataPath(name))
    refreshCount(name)
  }

  /** Write a dataset bucketed+sorted by `bucketCol` (registered as a
    * session table, `<name>` in the catalog's namespace). Joins/aggs between
    * tables bucketed the same way on the same key skip the shuffle
    * entirely — the 100-TB answer to the reference's group-label routing.
    * Buckets default to 32 (match spark.sql.shuffle.partitions). */
  def writeBucketed(name: String, df: DataFrame, bucketCol: String,
      buckets: Int = 32): Unit = {
    getOrCreate(name)
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .option("path", dataPath(name))
      .saveAsTable(name)
    refreshCount(name)
  }

  // ---------------------------------------------------------------- persist

  private def toJson(c: DataConfig): String =
    s"""{"name":"${c.name}","version":${c.version},"targetN":${c.targetN},""" +
      s""""targetUtilization":${c.targetUtilization},"noTarget":${c.noTarget},""" +
      s""""retentionDays":${c.retentionDays}}"""

  /** Persist configs as JSONL (dataset.go:209-227). */
  def save(): Unit = {
    Files.createDirectories(indexPath.getParent)
    Files.write(indexPath,
      configs.values.toSeq.sortBy(_.name).map(toJson).asJava,
      StandardCharsets.UTF_8)
  }

  /** Load configs from JSONL (dataset.go:166-188); unknown file → empty. */
  def load(): Unit = {
    if (!Files.exists(indexPath)) return
    val lines = Files.readAllLines(indexPath).asScala.toSeq.filter(_.nonEmpty)
    if (lines.isEmpty) return // empty index file = empty catalog
    import spark.implicits._
    val ds = spark.read.json(spark.createDataset(lines))
    ds.collect().foreach { r =>
      def idx(n: String) = r.schema.fieldNames.indexOf(n)
      val cfg = DataConfig(
        name = r.getString(idx("name")),
        version = r.getLong(idx("version")),
        targetN = r.getLong(idx("targetN")),
        targetUtilization = r.getDouble(idx("targetUtilization")),
        noTarget = r.getBoolean(idx("noTarget")),
        retentionDays = r.getLong(idx("retentionDays")).toInt)
      configs.put(cfg.name, cfg)
    }
  }
}
