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

  /** Composite passage id: windows-per-doc is bounded by the window
    * arithmetic (n/stride + 1), far under this; the id stays exact for
    * any doc_id the parquet fixtures carry. */
  private val PidBase = 4096L

  /** Passage retrieval — the chunk → BM25 composition (the RAG shape:
    * rank WINDOWS, not documents, so long documents can't bury the
    * matching span). Same zero-wide-shuffle single-query plan as
    * `retrieval_bm25`, run over the chunk frame. */
  private def passagesQ(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextRetrieval
    val ch = chunks(s, dir).select(
      (col("doc_id") * PidBase + col("chunk")).as("pid"), col("chunk_text"))
    TextRetrieval.bm25(ch, "pid", "chunk_text", RetrievalQueries.Terms, k = 10)
      .select(shiftright(col("pid"), 12).as("doc_id"), // exact: PidBase = 2^12
        pmod(col("pid"), lit(PidBase)).cast("int").as("chunk"),
        round(col(TextRetrieval.ScoreCol), 6).as("score"))
  }

  val MaxChars = 120
  val CharOverlap = 20
  private val CharStride = MaxChars - CharOverlap

  /** Character-offset chunking — byte-fidelity windows via substring. */
  private def chunkCharsQ(s: SparkSession, dir: String): DataFrame =
    Chunking.chunkByChars(
        Tables(s, dir, "documents").select("doc_id", "text"),
        "text", MaxChars, CharOverlap)
      .select("doc_id", "chunk", "chunk_text", "n_chars")

  /** Boundary-aware greedy chunking over synthesized sentence structure
    * (four '. '-joined slices — the corpus carries no sentence marks, so
    * ONE shared SQL string plants them in both engines): segments pack
    * greedily to ≤ 80 joined chars, never splitting a segment; a single
    * over-budget tail segment becomes its own chunk by the documented
    * no-split rule. The oracle replays the greedy walk as a recursive
    * CTE — state (running length, chunk id) stepped segment by segment. */
  private val SynthSentSql =
    "concat(substr(text,1,40), '. ', substr(text,41,30), '. ', " +
      "substr(text,71,50), '. ', substr(text,121))"
  private val SentMaxChars = 80

  private def sentencesQ(s: SparkSession, dir: String): DataFrame =
    Chunking.chunkBySeparator(
      Tables(s, dir, "documents")
        .select(col("doc_id"), expr(SynthSentSql).as("text")),
      "text", ". ", SentMaxChars)

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "chunk_docs" -> (chunkQ _),
    "chunk_chars" -> (chunkCharsQ _),
    "chunk_sentences" -> (sentencesQ _),
    "chunk_manifest" -> (manifestQ _),
    "retrieval_passages" -> (passagesQ _))

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
    "chunk_sentences" ->
      s"""WITH RECURSIVE d AS (SELECT doc_id, $SynthSentSql AS text FROM documents),
         |s0 AS (SELECT doc_id, string_split(text, '. ') AS sg FROM d),
         |segs AS (SELECT doc_id, i - 1 AS idx, sg[i] AS seg, len(sg[i]) AS sl
         |         FROM s0, unnest(generate_series(1, len(sg))) AS t(i)),
         |walk AS (
         |  SELECT doc_id, idx, seg, sl AS cur_len, 0 AS chunk
         |  FROM segs WHERE idx = 0
         |  UNION ALL
         |  SELECT s.doc_id, s.idx, s.seg,
         |    CASE WHEN w.cur_len + 2 + s.sl <= $SentMaxChars
         |         THEN w.cur_len + 2 + s.sl ELSE s.sl END,
         |    CASE WHEN w.cur_len + 2 + s.sl <= $SentMaxChars
         |         THEN w.chunk ELSE w.chunk + 1 END
         |  FROM walk w JOIN segs s ON s.doc_id = w.doc_id AND s.idx = w.idx + 1)
         |SELECT doc_id, chunk,
         |       array_to_string(list(seg ORDER BY idx), '. ') AS chunk_text
         |FROM walk GROUP BY doc_id, chunk""".stripMargin,
    "chunk_chars" ->
      s"""WITH n AS (SELECT doc_id, text, length(text) AS n FROM documents
         |           WHERE length(text) > 0),
         |c AS (SELECT doc_id, text,
         |        unnest(generate_series(0,
         |          greatest(0, ceil((n - $MaxChars)::DOUBLE / $CharStride)::INT))) AS chunk
         |      FROM n)
         |SELECT doc_id, chunk,
         |       substr(text, chunk * $CharStride + 1, $MaxChars) AS chunk_text,
         |       length(substr(text, chunk * $CharStride + 1, $MaxChars)) AS n_chars
         |FROM c""".stripMargin,
    "chunk_docs" ->
      s"""$windows
         |SELECT doc_id, chunk, array_to_string(wnd, ' ') AS chunk_text,
         |       len(wnd) AS n_tok
         |FROM w""".stripMargin,
    "chunk_manifest" ->
      s"""$windows
         |SELECT doc_id, count(*) AS chunks, sum(len(wnd))::BIGINT AS total_tok
         |FROM w GROUP BY doc_id""".stripMargin,
    "retrieval_passages" -> passagesSql)

  /** The BM25-over-windows oracle: identical arithmetic to the
    * `retrieval_bm25` oracle ([[RetrievalQueries.contribSql]] — same
    * association order, same DOUBLE casts), with documents replaced by
    * the window frame. The window's token list IS `wnd` lowered
    * (chunk text is wnd joined by single spaces, so re-tokenizing is a
    * per-element lower()). */
  private def passagesSql: String = {
    val terms = RetrievalQueries.Terms
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(tk, x -> x = '$t')) AS tf$i" }.mkString(",\n        ")
    val dfAggs = terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val score = terms.indices.map(i =>
      RetrievalQueries.contribSql(s"tf$i", s"df$i", "dl")).mkString(" + ")
    s"""$windows,
       |p AS (SELECT doc_id * $PidBase + chunk AS pid, doc_id, chunk,
       |        list_transform(wnd, x -> lower(x)) AS tk
       |      FROM w),
       |b AS (SELECT pid, doc_id, chunk, len(tk) AS dl,
       |        $tfCols FROM p),
       |st AS (SELECT count(*) AS n, avg(dl) AS avgdl, $dfAggs FROM b),
       |s AS (SELECT doc_id, chunk, pid, $score AS score FROM b CROSS JOIN st)
       |SELECT doc_id, chunk, round(score, 6) AS score FROM s
       |WHERE score > 0 ORDER BY score DESC, pid ASC LIMIT 10""".stripMargin
  }
}
