package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Attributes

/** Streaming attribute maintenance ([[StreamingAttributes]]): batches
  * tag-and-upsert at the boundary, re-ingested ids overwrite their stale
  * rows (the idempotence that turns at-least-once delivery into
  * effectively-once attribute state), and the final store equals a
  * one-shot tag of the latest version of every document. */
class StreamingAttributesSpec extends SparkTestBase {

  import spark.implicits._

  private val taggers = Seq(
    "n_tokens" -> size(split(col("text"), " ")).cast("long"),
    "n_chars" -> length(col("text")).cast("long"))

  test("batches upsert; re-ingested ids overwrite; store == latest-state tag") {
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files
      .createTempDirectory("graft-sattr").toString + "/store"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-sattr-ck").toString
    val stream = MemoryStream[(Long, String)]
    var seen = Vector.empty[(Long, Long)]
    def runOnce(): Unit = {
      val q = StreamingAttributes.writer(
          stream.toDF.toDF("doc_id", "text"), store, "doc_id", taggers,
          onBatch = (b, n) => seen :+= (b, n))
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination(120000)
    }
    // trigger 1: 20 fresh docs; trigger 2: 10 NEW + 5 RE-INGESTED longer
    stream.addData((0L until 20L).map(i => (i, s"doc $i body")): _*)
    runOnce()
    stream.addData(((20L until 30L).map(i => (i, s"doc $i body")) ++
      (0L until 5L).map(i => (i, s"doc $i body revised and longer"))): _*)
    runOnce()
    assert(seen.map(_._2) === Vector(20L, 15L))

    val (got, id) = Attributes.attrLoad(spark, store)
    assert(id === "doc_id")
    val latest = (5L until 30L).map(i => (i, s"doc $i body")) ++
      (0L until 5L).map(i => (i, s"doc $i body revised and longer"))
    val want = Attributes.tag(latest.toDF("doc_id", "text"), "doc_id", taggers)
    assert(got.count() === 30L)
    assert(got.exceptAll(want).count() === 0L &&
      want.exceptAll(got).count() === 0L,
      "streamed store != one-shot tag of the latest document versions")
  }

  test("a batch with duplicate ids refuses loudly") {
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files
      .createTempDirectory("graft-sattr2").toString + "/store"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-sattr2-ck").toString
    val stream = MemoryStream[(Long, String)]
    stream.addData((1L, "a"), (1L, "b"))
    val q = StreamingAttributes.writer(
        stream.toDF.toDF("doc_id", "text"), store, "doc_id", taggers)
      .option("checkpointLocation", ckpt)
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q.awaitTermination())
    assert(e.getMessage.contains("duplicate ids") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate ids")))
  }
}
