package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Test-table access for the driver-generated parquet (TESTDATA.md).
  *
  * The `events` table stores TIMESTAMP(NANOS), which Spark's parquet reader
  * rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong=true` (see
  * GraftSession) and this loader converts the nano longs to microsecond
  * timestamps — the same truncation DuckDB applies when it reads ns
  * parquet into its µs TIMESTAMP. */
object Tables {
  def apply(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  private val rowCounts = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Exact row count from the parquet FOOTERS, on the driver, no Spark
    * job — the raw-path analogue of
    * [[graft.model.DatasetCatalog.rowCount]], so the auto dispatchers'
    * `knownRows` can be threaded from here and a test-table query never
    * pays a count job just to size a plan (VERDICT r6 #8). Cached per
    * path (the test tables are immutable). Listing is RECURSIVE so a
    * partitioned/nested parquet layout counts every data file — a
    * one-level listing would silently under-count and mis-size the auto
    * dispatchers (ADVICE r7). */
  def rowCount(s: SparkSession, dir: String, name: String): Long = {
    val path = s"$dir/$name.parquet"
    rowCounts.getOrElseUpdate(path, {
      val conf = s.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isDirectory) {
          val out = Array.newBuilder[org.apache.hadoop.fs.FileStatus]
          val it = fs.listFiles(p, /* recursive = */ true)
          while (it.hasNext) {
            val f = it.next()
            if (f.getPath.getName.endsWith(".parquet")) out += f
          }
          out.result()
        } else Array(fs.getFileStatus(p))
      files.map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
        try r.getRecordCount finally r.close()
      }.sum
    })
  }
}
