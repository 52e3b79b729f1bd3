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

  test("floor of a shuffled lineage launches NO job at build time (AQE-safe probe)") {
    // VERDICT r12 #6 / ADVICE r12: the old probe called df.rdd, which under
    // AQE finalizes the adaptive plan and eagerly EXECUTES upstream shuffle
    // stages of a shuffled input — a hidden double execution. The hardened
    // probe inspects the non-adaptive physical plan and returns shuffled
    // lineages untouched, so calling floor on one must run zero Spark jobs.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    // count only jobs SUBMITTED inside the floor-call window — the async
    // listener bus can still be delivering stragglers from earlier tests
    @volatile var windowStart = Long.MaxValue
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (js.time >= windowStart) jobs.incrementAndGet()
    }
    // a genuinely shuffled, multi-consumer-shaped frame (groupBy exchange)
    val shuffled = (1L to 1000L).map(i => (i % 7, i)).toDF("k", "v")
      .groupBy("k").count()
    spark.sparkContext.addSparkListener(listener)
    try {
      windowStart = System.currentTimeMillis()
      val floored = Par.floor(shuffled, "k")
      // the listener bus is async (and private[spark], so no waitUntilEmpty
      // from here): give any in-flight job-start event ample time to land
      Thread.sleep(1000)
      assert(jobs.get() == 0,
        s"Par.floor materialized ${jobs.get()} job(s) while probing a shuffled lineage")
      // and the frame is returned untouched (same logical plan object)
      assert(floored eq shuffled)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
