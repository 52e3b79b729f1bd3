package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-path layout optimization — the scan-cost lever that costs
  * nothing at query time. A table written as `partitionBy(partitionCols)`
  * directories, with each directory's files RANGE-SPLIT and internally
  * SORTED on `sortCols`, gives two pruning layers on every subsequent
  * read:
  *
  *  - **Partition pruning (planning time)**: an equality/IN predicate on
  *    a partition column eliminates whole directories from the file
  *    listing — the scan's `PartitionFilters` — so a `lang = 'en'` read
  *    of a 100-language corpus lists ~1% of the files, before a single
  *    byte is read.
  *  - **Row-group skipping (read time)**: `repartitionByRange` on
  *    `partitionCols ++ sortCols` makes each task's output file cover a
  *    tight `sortCols` interval, and the in-file sort keeps parquet
  *    row-group min/max stats tight inside it — so a pushed range
  *    predicate (`PushedFilters`) skips whole row-groups by footer
  *    stats without decoding them.
  *
  * At 100 TB this is the difference between a full-corpus scan and
  * reading only the slice a filter names; the write itself is one
  * range-exchange + local sort, the same cost class as any shuffle of
  * the data being written. The reference ships whole datasets to every
  * peer and scans them linearly (/root/reference/data/data.go — flat
  * LevelDB iteration); directory + footer pruning is what replaces that
  * at Spark scale.
  *
  * Skew note: `repartitionByRange` samples the sort key, so a hot
  * partition value (one language = 30% of the corpus) spreads over many
  * range splits instead of one giant file — pruning on the partition
  * column still removes ALL of them at planning time. */
object Layout {

  /** Loud bound on partition-directory cardinality: each distinct
    * `partitionCols` tuple becomes a filesystem directory, and a
    * high-cardinality partition key (doc_id!) is the classic
    * small-files catastrophe — millions of directories, KB-sized files,
    * listing dominating every query. 10k directories is already a lot;
    * partition on LOW-cardinality columns (lang, source, date) and let
    * the range split handle the rest. */
  val MaxPartitionDirs = 10000

  /** Write `df` at `dir` with the two-layer pruned layout: directories
    * by `partitionCols`, each directory's data range-split into
    * `numRangeSplits` spans of `sortCols` and sorted inside every file.
    * The cardinality contract is checked with one cheap distinct-count
    * before any data moves. */
  def optimize(df: DataFrame, dir: String, partitionCols: Seq[String],
      sortCols: Seq[String], numRangeSplits: Int = 32): Unit = {
    require(partitionCols.nonEmpty || sortCols.nonEmpty,
      "layout optimize needs at least one partition or sort column")
    require(numRangeSplits >= 1, s"numRangeSplits=$numRangeSplits")
    if (partitionCols.nonEmpty) {
      val nDirs = df.select(partitionCols.map(col): _*).distinct().count()
      require(nDirs <= MaxPartitionDirs,
        s"$nDirs distinct ${partitionCols.mkString("(", ",", ")")} tuples " +
          s"exceed MaxPartitionDirs=$MaxPartitionDirs — a high-cardinality " +
          "partition key is the small-files catastrophe; partition on a " +
          "low-cardinality column and range-split on the rest")
    }
    val keys = (partitionCols ++ sortCols).map(col)
    val ranged =
      if (keys.isEmpty) df
      else df.repartitionByRange(numRangeSplits, keys: _*)
        .sortWithinPartitions(keys: _*)
    ranged.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(dir)
  }

  /** Read an optimized layout back. Plain `spark.read.parquet` — the
    * pruning is carried by the layout, not by reader options; this
    * exists so call sites document intent. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Z-ORDER the table on `zCols` — multi-dimensional clustering, the
    * layout answer when queries filter on MORE THAN ONE column. A
    * single-column sort ([[optimize]]) gives perfect row-group pruning on
    * that column and NONE on any other: each file spans the full range of
    * every non-sort column. Interleaving the bits of rank-bucketed column
    * values (the Morton / Z curve, the technique behind Delta's OPTIMIZE
    * ZORDER) makes every file cover a small HYPER-RECTANGLE of the value
    * space instead — its parquet footer min/max stats are tight on EVERY
    * z-column at once, so a selective predicate on any one of them skips
    * most files/row-groups by stats alone.
    *
    * Rank-bucketing, not min-max scaling: each column maps through its own
    * `approx_percentile` boundaries (2^bits buckets, ONE sketch pass for
    * all columns), so skewed distributions spread evenly across cells —
    * min-max interleaving would pile a Zipf column's mass into a handful
    * of cells and prune nothing. Boundaries are `(2^bits − 1)` doubles per
    * column on the driver — KBs.
    *
    * Scale cost: the same class as [[optimize]] — one sketch pass + one
    * range exchange on the z-value + local sort. Nulls bucket to cell 0
    * (they cluster at the curve's origin and prune like any other cell).
    * Columns must be numeric (hash strings to a long first — rank
    * bucketing makes the hash distribution irrelevant). */
  def zorder(df: DataFrame, dir: String, zCols: Seq[String],
      bits: Int = 8, numRangeSplits: Int = 32,
      partitionCols: Seq[String] = Nil, accuracy: Int = 10000): Unit = {
    require(zCols.size >= 2,
      "z-order needs >= 2 columns — for one column use optimize()")
    require(bits >= 1 && bits * zCols.size <= 62,
      s"bits=$bits x ${zCols.size} columns overflows the 62-bit z-value")
    require(numRangeSplits >= 1, s"numRangeSplits=$numRangeSplits")
    val b = 1 << bits
    val probs = (1 until b).map(i => i.toDouble / b)
    val boundAggs = zCols.map(c => expr(
      s"approx_percentile(cast(`$c` as double), " +
        s"array(${probs.mkString(",")}), $accuracy)").as(c))
    val boundsRow = df.select(boundAggs: _*).head()
    val buckets = zCols.zipWithIndex.map { case (c, i) =>
      val bs = Option(boundsRow.getSeq[Double](i)).getOrElse(Seq.empty[Double])
      if (bs.isEmpty) lit(0L)
      else aggregate(lit(bs.toArray), lit(0L),
        (acc, bd) => acc + when(col(c).cast("double") >= bd, 1L).otherwise(0L))
    }
    val zval = (for {
      ci <- zCols.indices
      i <- 0 until bits
    } yield shiftleft(shiftright(buckets(ci), i).bitwiseAND(lit(1L)),
        i * zCols.size + ci))
      .reduce(_ bitwiseOR _)
    df.withColumn("__z", zval)
      .repartitionByRange(numRangeSplits, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(dir)
  }

  /** Per-file (min, max) of `c` over a written layout — the bounding-box
    * evidence specs and verification queries use to prove z-locality:
    * for each data file, the extent its footer stats would expose to the
    * reader's row-group pruning. One metadata-cheap scan. */
  def fileExtents(spark: SparkSession, dir: String, c: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(c).cast("double")).as("lo"),
        max(col(c).cast("double")).as("hi"))

  /** Persist `df` as a BUCKETED table: rows hash-distributed into
    * `numBuckets` files per writer task on `bucketCols` and sorted
    * inside each file. A join (or aggregation) keyed on the bucket
    * columns between two tables bucketed the SAME way then satisfies
    * both sides' required distribution FROM THE LAYOUT — no Exchange in
    * the plan, the shuffle paid ONCE at write time instead of on every
    * query. At 100 TB, bucketing the fact tables on their join key is
    * the difference between re-shuffling the corpus per query and
    * reading co-located files. External-path table (explicit `dir`), so
    * no warehouse config is assumed; `mode=overwrite` replaces both
    * data and catalog entry. Spark's bucketed scan merges a bucket's
    * files per partition; with more than one file per bucket the
    * in-file sort does not globally order the bucket, so plans may
    * still carry a SORT — never an Exchange.
    * [[graft.model.DatasetCatalog.writeBucketed]] is the
    * catalog-integrated wrapper over this. */
  def bucketize(df: DataFrame, tableName: String, dir: String,
      bucketCols: Seq[String], numBuckets: Int): Unit = {
    require(bucketCols.nonEmpty, "bucketize needs at least one bucket column")
    require(numBuckets >= 1 && numBuckets <= 100000,
      s"numBuckets=$numBuckets outside [1, 100000]")
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", dir)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(tableName)
  }

  /** Pruning evidence from a query's physical plan: whether the scan
    * carries non-empty `PartitionFilters` (directory pruning) and
    * `PushedFilters` (footer row-group skipping). String inspection of
    * the formatted plan — the same surface `.explain` shows a human —
    * used by specs and verification queries to pin that a filter
    * actually REACHED the scan instead of evaluating post-read. */
  def pruning(df: DataFrame): (Boolean, Boolean) = {
    val plan = df.queryExecution.executedPlan.toString
    def nonEmptyClause(tag: String): Boolean = {
      val i = plan.indexOf(tag + ": [")
      val after = i + tag.length + 3
      i >= 0 && after < plan.length && plan.charAt(after) != ']'
    }
    (nonEmptyClause("PartitionFilters"), nonEmptyClause("PushedFilters"))
  }

  /** Default compaction target: 128 MB files — the classic
    * HDFS-block-sized parquet sweet spot (big enough that footer and
    * task overheads amortize, small enough to split work). */
  val DefaultTargetFileBytes: Long = 128L * 1024 * 1024

  /** Bin-pack a LEAF parquet directory's small files into
    * ~`targetFileBytes` files — the maintenance answer to the
    * small-files drift every append-heavy pipeline accumulates (each
    * streaming micro-batch or incremental append leaves another
    * KB-sized file; a million of them turns listing + task scheduling
    * into the query cost). One `coalesce` write — NO shuffle, input
    * splits merge map-side — into a sibling temp dir, then a two-rename
    * swap. Returns the new file count; a directory already at-or-below
    * the target count is left untouched (zero writes).
    *
    * Contract: `dir` must be a LEAF dir (no `col=value` partition
    * subdirectories — compacting through a partitioned root would
    * rewrite the directory structure away; call per leaf instead,
    * loudly checked). The swap is two renames, the same
    * not-torn-write-safe class as the catalog's bucketed write — for
    * stateful operators needing atomic readers-see-old-or-new, the
    * versioned-dir sidecar protocol (`graft.model.VersionedDir`)
    * remains the tool. */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = DefaultTargetFileBytes): Int = {
    require(targetFileBytes >= 1L, s"targetFileBytes=$targetFileBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    val entries = fs.listStatus(p)
    val subdirs = entries.filter(_.isDirectory).map(_.getPath.getName)
    require(!subdirs.exists(_.contains("=")),
      s"$dir contains partition subdirectories (${subdirs.take(3).mkString(", ")}) — " +
        "compact operates on LEAF dirs; call it per partition directory")
    val files = entries.filter(e => e.isFile && !e.getPath.getName.startsWith("_"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    if (files.length <= nOut) return files.length
    val tmp = new org.apache.hadoop.fs.Path(dir + ".compact_tmp")
    val old = new org.apache.hadoop.fs.Path(dir + ".compact_old")
    fs.delete(tmp, true); fs.delete(old, true)
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(p, old), s"compact: could not move $dir aside")
    require(fs.rename(tmp, p), s"compact: could not move compacted dir into place")
    fs.delete(old, true)
    nOut
  }
}
