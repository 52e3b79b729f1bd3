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

  test("custom decoder plugs in per partition") {
    val df = Seq((1L, "xyz")).toDF("doc_id", "text")
    val constDecoder = new MediaDecoder {
      def features(item: MediaItem) =
        MediaFeatures(item.id, "fake", 42, Array.fill(16)(1L))
    }
    val f = Multimodal.featurize(Multimodal.fromText(df, "doc_id", "text"), constDecoder).head()
    assert(f.nBytes == 42 && f.modality == "fake")
  }

  test("real-codec hooks are explicit stubs") {
    intercept[UnsupportedOperationException](Multimodal.decodeImage(Array[Byte]()))
    intercept[UnsupportedOperationException](Multimodal.decodeAudio(Array[Byte]()))
  }
}
