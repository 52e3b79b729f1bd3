package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs as a partition-local transform.
  *
  * The Spark-side plumbing here is real — schema, encoders, mapPartitions
  * batch shape, and the feature output contract — while the actual media
  * decoding is STUBBED (this container has no image/audio codecs):
  * [[StubDecoder]] derives deterministic features from the raw bytes, and
  * [[Multimodal.decodeImage]]/[[Multimodal.decodeAudio]] mark where a real
  * codec plugs in. Decoders run per-partition (no per-row JVM/codec setup;
  * codec state is reused across a partition's rows), which is the shape a
  * real JNI/JavaCV decoder needs at scale.
  */
object Multimodal {

  final case class MediaMeta(
      modality: String, // "image" | "audio" | "video" | "text"
      width: Int,
      height: Int,
      sampleRate: Int,
      durationMs: Long)

  final case class MediaItem(id: Long, content: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      id: Long,
      modality: String,
      nBytes: Int,
      byteHist: Array[Long]) // 16 buckets of byte>>4

  /** A partition-local decoder: opened once per partition, applied per row. */
  trait MediaDecoder extends Serializable {
    def features(item: MediaItem): MediaFeatures
  }

  /** Deterministic fake decoder: a 16-bin histogram of the high nibble of
    * each byte. Stands in for "decode → embed" so the distributed plumbing
    * is fully testable and oracle-checkable. */
  object StubDecoder extends MediaDecoder {
    override def features(item: MediaItem): MediaFeatures = {
      val hist = new Array[Long](16)
      item.content.foreach(b => hist((b & 0xFF) >> 4) += 1)
      MediaFeatures(item.id, item.meta.modality, item.content.length, hist)
    }
  }

  /** Real-codec hooks — NOT implemented in this environment. A production
    * deployment swaps these in behind [[MediaDecoder]]. */
  def decodeImage(bytes: Array[Byte]): Nothing =
    throw new UnsupportedOperationException(
      "image codecs unavailable in this container; plug a real MediaDecoder")
  def decodeAudio(bytes: Array[Byte]): Nothing =
    throw new UnsupportedOperationException(
      "audio codecs unavailable in this container; plug a real MediaDecoder")

  /** Distributed featurize: one pass, partition-local decode, no shuffle.
    * Input must have (id long, content binary, meta struct). */
  def featurize(items: Dataset[MediaItem],
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions(it => it.map(decoder.features))
  }

  /** Wrap a text table as media items (text bytes as the binary payload) —
    * the ingestion shape for any modality. */
  def fromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaItem] = {
    import df.sparkSession.implicits._
    df.select(
        col(idCol).cast("long").as("id"),
        encode(col(textCol), "UTF-8").as("content"),
        struct(
          lit("text").as("modality"),
          lit(0).as("width"), lit(0).as("height"),
          lit(0).as("sampleRate"),
          lit(0L).as("durationMs")).as("meta"))
      .as[MediaItem]
  }
}
