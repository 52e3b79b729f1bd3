package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the driver-generated parquet (TESTDATA.md). */
object Tables {
  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
