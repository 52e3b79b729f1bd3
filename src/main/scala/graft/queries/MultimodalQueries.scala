package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal pipeline as a driver query: documents → binary payloads →
  * partition-local stub decode → per-byte-bucket histogram in long format.
  * The text is ASCII, so the DuckDB oracle reproduces the byte histogram
  * from character codes. */
object MultimodalQueries {

  private def features(s: SparkSession, dir: String): DataFrame = {
    val items = Multimodal.fromText(Tables(s, dir, "documents"), "doc_id", "text")
    val feats = Multimodal.featurize(items).toDF()
    feats.select(col("id").as("doc_id"), col("modality"), col("nBytes").as("n_bytes"),
        posexplode(col("byteHist")))
      .filter(col("col") > 0)
      .select(col("doc_id"), col("modality"), col("n_bytes"),
        col("pos").as("bin"), col("col").as("cnt"))
  }

  /** Frame sampling end-to-end: docs as media items → 64-byte frames
    * capped at 4 per item → (frame_id, n_bytes). The oracle replays the
    * chunking arithmetically (chunk size = least(64, remaining bytes)),
    * so the flatMap explode shape and the id contract (parent·2²⁰ + idx)
    * are hash-verified, not only spec'd. */
  private def frames(s: SparkSession, dir: String): DataFrame = {
    val items = Multimodal.fromText(Tables(s, dir, "documents"), "doc_id", "text")
    Multimodal.sampleFrames(items, frameBytes = 64, maxFrames = 4).toDF()
      .select(col("id").as("frame_id"),
        length(col("content")).cast("long").as("n_bytes"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> (features _),
    "multimodal_frames" -> (frames _))

  def oracle: Map[String, String] = Map(
    "multimodal_features" ->
      """WITH b AS (SELECT doc_id, len(text) AS n_bytes,
        |             unnest(list_transform(generate_series(1, len(text)),
        |                    i -> ascii(text[i]) // 16)) AS bin
        |           FROM documents)
        |SELECT doc_id, 'text' AS modality, n_bytes, bin, count(*) AS cnt
        |FROM b GROUP BY doc_id, n_bytes, bin""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id * 1048576 + i.generate_series AS frame_id,
        |       least(64, octet_length(encode(text)) - i.generate_series * 64) AS n_bytes
        |FROM documents, generate_series(0, 3) i
        |WHERE octet_length(encode(text)) > i.generate_series * 64""".stripMargin)
}
