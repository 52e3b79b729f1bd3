package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ParSpec extends SparkTestBase {

  import spark.implicits._

  test("floor raises an under-parallel frame to default parallelism") {
    val df = (1L to 1000L).map(i => (i, s"t$i")).toDF("id", "text")
      .coalesce(1)
    val target = spark.sparkContext.defaultParallelism
    val floored = Par.floor(df, "id")
    assert(floored.rdd.getNumPartitions == target)
    // row set unchanged
    assert(floored.as[(Long, String)].collect().toSet ==
      df.as[(Long, String)].collect().toSet)
  }

  test("floor is a no-op when the input is already at least that parallel") {
    val target = spark.sparkContext.defaultParallelism
    val df = (1L to 1000L).toDF("id").repartition(target + 4, col("id"))
    val floored = Par.floor(df, "id")
    // no extra exchange: the plan keeps its partitioning (and count)
    assert(floored.rdd.getNumPartitions == target + 4)
    assert(floored.queryExecution.executedPlan.toString ==
      df.queryExecution.executedPlan.toString)
  }
}
