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

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> (features _))

  def oracle: Map[String, String] = Map(
    "multimodal_features" ->
      """WITH b AS (SELECT doc_id, len(text) AS n_bytes,
        |             unnest(list_transform(generate_series(1, len(text)),
        |                    i -> ascii(text[i]) // 16)) AS bin
        |           FROM documents)
        |SELECT doc_id, 'text' AS modality, n_bytes, bin, count(*) AS cnt
        |FROM b GROUP BY doc_id, n_bytes, bin""".stripMargin)
}
