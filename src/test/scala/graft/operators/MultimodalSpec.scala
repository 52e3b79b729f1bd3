package graft.operators

import graft.SparkTestBase
import graft.operators.Multimodal._

class MultimodalSpec extends SparkTestBase {

  import spark.implicits._

  test("fromText + featurize: byte histogram matches the bytes, end to end") {
    val df = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val feats = Multimodal.featurize(Multimodal.fromText(df, "doc_id", "text"))
      .collect().map(f => f.id -> f).toMap
    assert(feats(1L).nBytes == 3)
    // 'a'=0x61,'b'=0x62,'c'=0x63 -> all in bucket 6
    assert(feats(1L).byteHist(6) == 3 && feats(1L).byteHist.sum == 3)
    assert(feats(2L).nBytes == 0 && feats(2L).byteHist.sum == 0)
    assert(feats(1L).modality == "text")
  }

  test("fromText drops null-id/null-text rows instead of failing downstream") {
    val df = Seq(
      (Some(1L), Some("ok")),
      (None, Some("no id")),
      (Some(3L), None)
    ).toDF("doc_id", "text")
    val items = Multimodal.fromText(df, "doc_id", "text").collect()
    assert(items.map(_.id).toSeq == Seq(1L))
  }

  test("custom decoder plugs in per partition") {
    val df = Seq((1L, "xyz")).toDF("doc_id", "text")
    val constDecoder = new MediaDecoder {
      def features(item: MediaItem) =
        MediaFeatures(item.id, "fake", 42, Array.fill(16)(1L))
    }
    val f = Multimodal.featurize(Multimodal.fromText(df, "doc_id", "text"), constDecoder).head()
    assert(f.nBytes == 42 && f.modality == "fake")
  }

  test("resize transform rewrites payload size and metadata, one pass") {
    val df = Seq((1L, "abcdef"), (2L, "")).toDF("doc_id", "text")
    val resized = Multimodal.transform(
        Multimodal.fromText(df, "doc_id", "text"), StubResize(4, 2))
      .collect().map(i => i.id -> i).toMap
    assert(resized(1L).content.length == 8)
    assert(resized(1L).meta.width == 4 && resized(1L).meta.height == 2)
    // deterministic cycled payload: "abcdefab"
    assert(new String(resized(1L).content, "UTF-8") == "abcdefab")
    assert(resized(2L).content.length == 8) // empty source still yields w*h
  }

  test("frame sampling explodes one item into bounded frame items") {
    val df = Seq((3L, "0123456789")).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(
        Multimodal.fromText(df, "doc_id", "text"), frameBytes = 4, maxFrames = 2)
      .collect().sortBy(_.id)
    assert(frames.length == 2) // 3 chunks capped at 2
    assert(frames.map(_.id).toSeq == Seq((3L << 20) + 0, (3L << 20) + 1))
    assert(new String(frames(0).content, "UTF-8") == "0123")
    assert(new String(frames(1).content, "UTF-8") == "4567")
    assert(frames.forall(_.meta.modality == "image"))
  }

  test("real-codec hooks are explicit stubs") {
    intercept[UnsupportedOperationException](Multimodal.decodeImage(Array[Byte]()))
    intercept[UnsupportedOperationException](Multimodal.decodeAudio(Array[Byte]()))
  }

  test("decoder close() fires at task completion — every open gets a release") {
    // local mode shares the JVM, so static counters observe executor tasks
    val df = (1L to 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    MultimodalSpec.opens.set(0); MultimodalSpec.closes.set(0)
    val trackingDecoder = new MediaDecoder {
      override def open(): Unit = MultimodalSpec.opens.incrementAndGet()
      override def close(): Unit = MultimodalSpec.closes.incrementAndGet()
      def features(item: MediaItem) =
        MediaFeatures(item.id, "t", 0, Array.fill(16)(0L))
    }
    Multimodal.featurize(
      Multimodal.fromText(df, "doc_id", "text").repartition(4), trackingDecoder)
      .collect()
    assert(MultimodalSpec.opens.get() > 0)
    assert(MultimodalSpec.closes.get() == MultimodalSpec.opens.get(),
      s"opens=${MultimodalSpec.opens.get()} closes=${MultimodalSpec.closes.get()}")
  }
}

object MultimodalSpec {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
}
