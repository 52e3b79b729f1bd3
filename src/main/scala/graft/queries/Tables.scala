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
}
