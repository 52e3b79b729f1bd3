package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Layout

/** Streaming layout sink ([[StreamingLayoutSink]]): micro-batch appends
  * land under partition directories, the per-leaf compaction gate keeps
  * every leaf's loose-file count bounded across many batches, no row is
  * lost through the compactions, and the resulting layout still prunes
  * on read. */
class StreamingLayoutSinkSpec extends SparkTestBase {

  import spark.implicits._

  private def looseFiles(leaf: java.io.File): Int =
    Option(leaf.listFiles()).getOrElse(Array.empty)
      .count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))

  test("appends + compaction gate: rows complete, leaves bounded, reads prune") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-slayout").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-slayout-ck").toString
    val stream = MemoryStream[(Long, String, Int)]
    // 12 batches × 30 rows over 3 langs — far past the file bound
    (0 until 12).foreach { b =>
      stream.addData((0 until 30).map { i =>
        val id = b * 30L + i
        (id, Seq("en", "de", "fr")((id % 3).toInt), (id % 100).toInt)
      }: _*)
    }
    var compactions = Vector.empty[(Long, Seq[(String, Int)])]
    val q = StreamingLayoutSink.writer(
        stream.toDF.toDF("id", "lang", "score"),
        dir, partitionCols = Seq("lang"), maxFilesPerLeaf = 3,
        targetFileBytes = 1L << 20,
        onBatch = (b, c) => compactions :+= (b, c))
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination(120000)

    // every row landed exactly once (no crash-replay in this run)
    val back = spark.read.parquet(dir)
    assert(back.count() === 360L)
    assert(back.select("id").as[Long].collect().toSet ===
      (0 until 360).map(_.toLong).toSet)
    // the gate fired and every leaf is bounded (compact packs to 1 file
    // at this size, so ≤ maxFilesPerLeaf + a few post-compaction appends)
    assert(compactions.exists(_._2.nonEmpty), "compaction gate never fired")
    val leaves = new java.io.File(dir).listFiles().filter(_.isDirectory)
    assert(leaves.map(_.getName).toSet === Set("lang=en", "lang=de", "lang=fr"))
    leaves.foreach { l =>
      assert(looseFiles(l) <= 4, s"${l.getName} has ${looseFiles(l)} files")
    }
    // a maintained leaf still prunes on read
    val scan = spark.read.parquet(dir).filter($"lang" === "en")
    val (pp, _) = Layout.pruning(scan)
    assert(pp, "partition pruning lost through streaming maintenance")
    assert(scan.count() === 120L)
  }

  test("maintain is a no-op under the bound and on a missing dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-slayout2").toString + "/t"
    Seq((1L, "en"), (2L, "de")).toDF("id", "lang")
      .write.partitionBy("lang").parquet(dir)
    assert(StreamingLayoutSink.maintain(spark, dir, maxFilesPerLeaf = 16) === Nil)
    assert(StreamingLayoutSink.maintain(spark, dir + "_missing", 16) === Nil)
  }
}
