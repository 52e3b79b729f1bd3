package graft.functions

import org.apache.spark.sql.SparkSession

/** Per-session SQL registration of the engine's function table (shared
  * with [[graft.GraftExtensions]], which is the cluster-wide installer via
  * `spark.sql.extensions`). */
object GraftFunctions {
  def register(implicit spark: SparkSession): Unit =
    graft.GraftExtensions.functions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, builder, "scala_udf")
    }
}
