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

  test("zorder: rows preserved, files cover tight boxes on BOTH dims") {
    // 60k uniform 2-d points; a single-column sort leaves every file
    // spanning ~the full range of the OTHER dim. Z-order must bound both.
    val pts = spark.range(60000).select(
      $"id",
      (($"id" * 7919) % 60000).cast("double").as("x"),
      (($"id" * 104729) % 60000).cast("double").as("y"))
      .localCheckpoint()
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val zdir = s"$base/z"
    val sdir = s"$base/s"
    Layout.zorder(pts, zdir, Seq("x", "y"), bits = 8, numRangeSplits = 16)
    Layout.optimize(pts, sdir, Nil, Seq("x"), numRangeSplits = 16)
    // content identical
    val back = spark.read.parquet(zdir).select("id", "x", "y")
      .except(pts).count()
    assert(back === 0 && spark.read.parquet(zdir).count() === 60000)

    def meanExtent(dir: String, c: String): Double = {
      val ext = Layout.fileExtents(spark, dir, c)
        .select(($"hi" - $"lo") / 60000.0).as[Double].collect()
      ext.sum / ext.length
    }
    // sorted-by-x control: x tight, y spans ~everything
    assert(meanExtent(sdir, "x") < 0.15, s"x ${meanExtent(sdir, "x")}")
    assert(meanExtent(sdir, "y") > 0.8, s"y ${meanExtent(sdir, "y")}")
    // z-order: BOTH dims bounded well below the full range
    assert(meanExtent(zdir, "x") < 0.45, s"zx ${meanExtent(zdir, "x")}")
    assert(meanExtent(zdir, "y") < 0.45, s"zy ${meanExtent(zdir, "y")}")

    // stats-pruning evidence: files whose bounding box overlaps a 5% band
    // of y — the sorted-x layout cannot exclude any
    def overlapping(dir: String): Long =
      Layout.fileExtents(spark, dir, "y")
        .filter($"hi" >= 10000.0 && $"lo" <= 13000.0).count()
    val totalZ = Layout.fileExtents(spark, zdir, "y").count()
    assert(overlapping(sdir) === Layout.fileExtents(spark, sdir, "y").count(),
      "sorted-x control unexpectedly pruned on y")
    assert(overlapping(zdir).toDouble / totalZ < 0.7,
      s"z files overlapping y-band: ${overlapping(zdir)}/$totalZ")
  }

  test("zorder: rank bucketing keeps a skewed dim prunable") {
    // Zipf-ish x: 80% of rows share 3 values; min-max interleave would
    // collapse them into a sliver. Rank buckets must still bound y.
    val pts = spark.range(30000).select(
      $"id",
      when(pmod($"id", lit(10)) < 8, pmod($"id", lit(3)))
        .otherwise(pmod($"id" * 7919, lit(30000))).cast("double").as("x"),
      pmod($"id" * 104729, lit(30000)).cast("double").as("y"))
      .localCheckpoint()
    val zdir = java.nio.file.Files.createTempDirectory("graft-zorder2").toString + "/z"
    Layout.zorder(pts, zdir, Seq("x", "y"), bits = 8, numRangeSplits = 16)
    assert(spark.read.parquet(zdir).count() === 30000)
    val extY = Layout.fileExtents(spark, zdir, "y")
      .select(($"hi" - $"lo") / 30000.0).as[Double].collect()
    assert(extY.sum / extY.length < 0.6,
      s"y extent under skewed x: ${extY.sum / extY.length}")
  }

  test("zorder argument guards") {
    val df = spark.range(10).select($"id", $"id".cast("double").as("x"),
      $"id".cast("double").as("y"))
    val d = java.nio.file.Files.createTempDirectory("graft-zorder3").toString
    assert(intercept[IllegalArgumentException] {
      Layout.zorder(df, d, Seq("x"))
    }.getMessage.contains(">= 2"))
    assert(intercept[IllegalArgumentException] {
      Layout.zorder(df, d, Seq("x", "y"), bits = 32)
    }.getMessage.contains("62-bit"))
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
