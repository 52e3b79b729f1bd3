package graft.model

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Co-located join via bucketed storage: two tables bucketed on the same
  * key join WITHOUT a shuffle (no Exchange over the bucketed scans), and
  * parquet filter pushdown reaches the scan. These are the plan properties
  * the engine relies on at cluster scale. */
class BucketedJoinSpec extends SparkTestBase {

  import spark.implicits._

  test("bucketed tables join with no shuffle exchange") {
    val dir = Files.createTempDirectory("graft-bucketed").toString
    val c = new DatasetCatalog(spark, dir)
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "vb")
    c.writeBucketed("bjs_a", a, "k", buckets = 4)
    c.writeBucketed("bjs_b", b, "k", buckets = 4)

    // disable broadcast so the planner considers the bucketed SMJ path
    // (tiny test tables would otherwise broadcast and skip bucketing)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bjs_a").join(spark.table("bjs_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free join:\n$plan")
      assert(joined.count() == 1000)

      // the catalog's OWN read path must keep the bucket metadata — a
      // path-based parquet read would silently re-shuffle this join
      val viaCatalog = c.table("bjs_a").join(c.table("bjs_b"), "k")
      val catPlan = viaCatalog.queryExecution.executedPlan.toString
      assert(!catPlan.contains("Exchange"),
        s"catalog.table dropped bucket metadata:\n$catPlan")

      // contrast: the same join over plain (unbucketed) data shuffles
      val shuffled = a.join(b, "k").queryExecution.executedPlan.toString
      assert(shuffled.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("parquet filter pushdown reaches the scan (PushedFilters)") {
    val dir = Files.createTempDirectory("graft-pushdown").toString
    spark.range(10000).select($"id", ($"id" % 7).as("m")).write.parquet(s"$dir/t")
    val df = spark.read.parquet(s"$dir/t").filter($"id" === 42).select("m")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,42)]"), scan)
    assert(df.count() == 1)
  }
}
