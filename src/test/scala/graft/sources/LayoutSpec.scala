package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Layout optimization ([[Layout]]): the rewrite preserves every row,
  * produces one directory per partition value, and a selective read of
  * the result carries the filter INTO the scan — `PartitionFilters` for
  * the directory column, `PushedFilters` for the sorted column — while
  * an unpartitioned write of the same data gets neither pruning layer.
  * The cardinality guard refuses the small-files catastrophe. */
class LayoutSpec extends SparkTestBase {

  import spark.implicits._

  private def corpus = (0 until 2000).map { i =>
    (i.toLong, s"g${i % 5}", (i * 7919) % 1000, s"doc $i")
  }.toDF("id", "grp", "score", "text")

  test("optimize preserves rows and writes one directory per value") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    Layout.optimize(corpus, dir, Seq("grp"), Seq("score"))
    val back = Layout.read(spark, dir)
    assert(back.count() === 2000L)
    assert(back.select("id").as[Long].collect().toSet ===
      (0 until 2000).map(_.toLong).toSet)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs === (0 until 5).map(i => s"grp=g$i").toSet)
  }

  test("selective read prunes directories AND pushes the range filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    Layout.optimize(corpus, dir, Seq("grp"), Seq("score"))
    val scan = Layout.read(spark, dir)
      .filter($"grp" === "g2" && $"score".between(100, 300))
    val (partPruned, pushed) = Layout.pruning(scan)
    assert(partPruned, "partition filter did not reach the scan")
    assert(pushed, "range filter was not pushed to the reader")
    // and the result is the plain filter of the original data
    val expect = corpus.filter($"grp" === "g2" && $"score".between(100, 300))
      .select("id").as[Long].collect().toSet
    assert(scan.select("id").as[Long].collect().toSet === expect)
  }

  test("unpartitioned baseline: no partition pruning layer") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    corpus.write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir).filter($"grp" === "g2")
    val (partPruned, pushed) = Layout.pruning(scan)
    assert(!partPruned, "flat layout cannot partition-prune")
    assert(pushed, "equality filter should still push to footers")
  }

  test("same-bucketed tables join without shuffling the join key") {
    val base = java.nio.file.Files.createTempDirectory("graft-bkt").toString
    val left = (0 until 500).map(i => (i.toLong % 50, i.toLong))
      .toDF("k", "lv")
    val right = (0 until 300).map(i => (i.toLong % 40, i.toLong * 2))
      .toDF("k", "rv")
    Layout.bucketize(left, "graft_spec_bkt_l", s"$base/l", Seq("k"), 4)
    Layout.bucketize(right, "graft_spec_bkt_r", s"$base/r", Seq("k"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_spec_bkt_l")
        .join(spark.table("graft_spec_bkt_r"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      // identical result to the plain join of the source frames
      val got = j.select("k", "lv", "rv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expect = left.join(right, "k").select("k", "lv", "rv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expect)
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_spec_bkt_l")
      spark.sql("DROP TABLE IF EXISTS graft_spec_bkt_r")
    }
  }

  test("compact bin-packs small files, preserves rows, skips when already tight") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    // 64 tiny files
    corpus.repartition(64).write.mode("overwrite").parquet(dir)
    val before = new java.io.File(dir).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(before === 64)
    val n = Layout.compact(spark, dir, targetFileBytes = 512L * 1024)
    val after = new java.io.File(dir).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(n === after && after < 64, s"n=$n after=$after")
    val back = spark.read.parquet(dir)
    assert(back.count() === 2000L)
    assert(back.select("id").as[Long].collect().toSet ===
      (0 until 2000).map(_.toLong).toSet)
    // idempotent: already at/below target count → untouched
    val again = Layout.compact(spark, dir, targetFileBytes = 512L * 1024)
    assert(again === after)
    // partitioned root refused loudly
    val pdir = java.nio.file.Files.createTempDirectory("graft-compact2").toString + "/p"
    Layout.optimize(corpus, pdir, Seq("grp"), Seq("score"))
    val e = intercept[IllegalArgumentException] {
      Layout.compact(spark, pdir)
    }
    assert(e.getMessage.contains("LEAF"))
    // but a leaf partition dir inside it compacts fine
    val leaf = s"$pdir/grp=g0"
    val nl = Layout.compact(spark, leaf, targetFileBytes = 512L * 1024)
    assert(nl >= 1)
  }

  test("cardinality guard refuses a high-cardinality partition key") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val e = intercept[IllegalArgumentException] {
      Layout.optimize(
        spark.range(20001).select($"id", ($"id" % 7).as("v")),
        dir, Seq("id"), Seq("v"))
    }
    assert(e.getMessage.contains("MaxPartitionDirs"))
    val e2 = intercept[IllegalArgumentException] {
      Layout.optimize(corpus, dir, Nil, Nil)
    }
    assert(e2.getMessage.contains("at least one"))
  }
}
