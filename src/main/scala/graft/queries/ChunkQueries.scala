package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.operators.Chunking

/** Token-window chunking as driver queries: every document split into
  * 32-token windows with 8-token overlap (stride 24), plus the per-doc
  * coverage manifest. DuckDB replays the identical windows via
  * `list_slice`, so chunk text hash-matches byte-for-byte. */
object ChunkQueries {

  val MaxTokens = 32
  val Overlap = 8
  private val Stride = MaxTokens - Overlap

  private def chunks(s: SparkSession, dir: String): DataFrame =
    Chunking.chunkByTokens(
      Tables(s, dir, "documents").select("doc_id", "text"),
      "text", MaxTokens, Overlap)

  private def chunkQ(s: SparkSession, dir: String): DataFrame =
    chunks(s, dir).select("doc_id", "chunk", "chunk_text", "n_tok")

  private def manifestQ(s: SparkSession, dir: String): DataFrame =
    Chunking.chunkManifest(chunks(s, dir), "doc_id")

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "chunk_docs" -> (chunkQ _),
    "chunk_manifest" -> (manifestQ _))

  /** Shared window CTE — `w` is (doc_id, chunk, wnd). */
  private val windows =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(text, '${TextHash.WsRegex}'),
       |                     x -> x <> '') AS tk
       |  FROM documents),
       |n AS (SELECT doc_id, tk, len(tk) AS n FROM tok WHERE len(tk) > 0),
       |c AS (
       |  SELECT doc_id, tk,
       |         unnest(generate_series(0,
       |           greatest(0, ceil((n - $MaxTokens)::DOUBLE / $Stride)::INT))) AS chunk
       |  FROM n),
       |w AS (
       |  SELECT doc_id, chunk,
       |         tk[chunk * $Stride + 1 : chunk * $Stride + $MaxTokens] AS wnd
       |  FROM c)""".stripMargin

  def oracle: Map[String, String] = Map(
    "chunk_docs" ->
      s"""$windows
         |SELECT doc_id, chunk, array_to_string(wnd, ' ') AS chunk_text,
         |       len(wnd) AS n_tok
         |FROM w""".stripMargin,
    "chunk_manifest" ->
      s"""$windows
         |SELECT doc_id, count(*) AS chunks, sum(len(wnd))::BIGINT AS total_tok
         |FROM w GROUP BY doc_id""".stripMargin)
}
