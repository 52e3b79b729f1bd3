package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Sampling

class TrainingExportSpec extends SparkTestBase {
  import spark.implicits._

  test("shards are contiguous, equal within one row, and replay the global order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-texp").toString + "/t"
    val df = (0L until 103L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val man = TrainingExport.exportShards(df, "doc_id", dir, nShards = 4)
      .orderBy("shard")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(man.map(_._1) === Seq(0, 1, 2, 3))
    // equal within one row: 103 over 4 -> 26/26/26/25 in SOME arrangement
    assert(man.map(_._2).sum === 103L)
    assert(man.map(_._2).max - man.map(_._2).min <= 1L)
    // contiguous, disjoint, gap-free slices covering 0..102
    val slices = man.map(m => (m._3, m._4))
    assert(slices.head._1 === 0L && slices.last._2 === 102L)
    slices.sliding(2).foreach { case Seq((_, hi), (lo2, _)) =>
      assert(lo2 === hi + 1, s"gap/overlap at $hi -> $lo2")
    }
    // reading back ordered by (shard, pos) == the deterministic global order
    val got = spark.read.parquet(dir).orderBy("shard", "pos")
      .select("doc_id").as[Long].collect().toSeq
    val want = Sampling.deterministicOrderIndex(df.select($"doc_id"), "doc_id")
      .orderBy("pos").select("doc_id").as[Long].collect().toSeq
    assert(got === want)
    // every shard directory's files are internally pos-sorted (resume
    // contract: a trainer streams a file straight through)
    val files = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(f => f.getName.endsWith(".parquet"))
    files.foreach { f =>
      val ps = spark.read.parquet(f.getAbsolutePath)
        .select("pos").as[Long].collect().toSeq
      assert(ps === ps.sorted, s"unsorted shard file ${f.getName}")
    }
  }

  test("guards: pos column clash and shard bounds refuse") {
    val df = Seq((1L, 0L)).toDF("doc_id", "pos")
    val e = intercept[IllegalArgumentException](
      TrainingExport.exportShards(df, "doc_id", "/tmp/x", 2))
    assert(e.getMessage.contains("pos"))
    val e2 = intercept[IllegalArgumentException](
      TrainingExport.exportShards(
        Seq((1L, "a")).toDF("doc_id", "text"), "doc_id", "/tmp/x", 0))
    assert(e2.getMessage.contains("nShards"))
    val e3 = intercept[IllegalArgumentException](
      TrainingExport.exportShards(
        Seq((1L, "a"), (1L, "b")).toDF("doc_id", "text"), "doc_id", "/tmp/x", 2))
    assert(e3.getMessage.contains("duplicate"))
    val e4 = intercept[IllegalArgumentException](
      TrainingExport.exportShards(
        Seq((1L, 0)).toDF("doc_id", "shard"), "doc_id", "/tmp/x", 2))
    assert(e4.getMessage.contains("shard"))
  }
}
