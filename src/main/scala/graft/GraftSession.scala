package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard local config. On a real
  * cluster only the SQL confs apply; master/shuffle sizing come from the
  * deployment. */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      // driver testdata stores TIMESTAMP(NANOS); read as long, normalized
      // in graft.queries.Tables
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    // default to the host's cores — a hardcoded 32 oversubscribes smaller
    // machines and skews self-measured baselines (ADVICE round-1); the
    // env override remains for pinning deliberate configurations
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val s = builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
