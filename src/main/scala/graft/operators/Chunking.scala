package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Token-window document chunking — splitting long documents into
  * bounded overlapping windows, the standard preprocessing step in front
  * of embedding models / context-length-limited consumers (and the
  * producer side of the ANN index: chunk → embed → [[Ann]]). Beyond the
  * reference's surface; first-class here because a 100-TB corpus always
  * carries documents longer than any model context.
  *
  * Pure map-side: tokenize, compute the chunk count per document, one
  * `posexplode` over the window starts, slice + rejoin. No shuffle, no
  * state, codegen builtins only — the plan scales linearly and the
  * chunk fan-out per row is bounded by `len/stride`.
  *
  * Window semantics (the standard sliding-window contract):
  *  - tokens are the engine-wide whitespace tokenization
  *    ([[TextHash.WsRegex]]), LOWERCASE-PRESERVING (chunk text is
  *    payload, not a hash key — unlike the dedup/feature kernels there
  *    is no case folding);
  *  - chunk `c` covers tokens `[c·stride, c·stride + maxTokens)` with
  *    `stride = maxTokens − overlap`; the last window may be shorter;
  *    a document of ≤ `maxTokens` tokens yields exactly one chunk;
  *    documents with zero tokens yield zero chunks;
  *  - chunk text is the window's tokens joined with single spaces —
  *    inter-token whitespace is NORMALIZED, by contract (token-level
  *    windows cannot preserve the original byte spans; callers needing
  *    byte fidelity chunk by [[substring]] offsets instead). */
object Chunking {

  /** Explode `textCol` into overlapping token windows. Output keeps every
    * input column and appends `chunk` (0-based window index), `chunkCol`
    * (the window text) and `n_tok` (window token count). */
  def chunkByTokens(df: DataFrame, textCol: String, maxTokens: Int,
      overlap: Int, chunkCol: String = "chunk_text"): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap for maxTokens=$maxTokens")
    require(!df.columns.exists(c => c == "chunk" || c == chunkCol || c == "n_tok"),
      s"chunkByTokens emits columns chunk, $chunkCol, n_tok — rename the existing ones")
    val stride = maxTokens - overlap
    // split() emits a leading/trailing "" for boundary whitespace —
    // filter to the tokenizer's non-empty contract
    val tk = filter(split(col(textCol), TextHash.WsRegex), t => t =!= "")
    // window starts off the MATERIALIZED token column: a separate
    // `.filter(nChunks > 0)` gets pushed below the projection and
    // re-evaluates the (interpreted-HOF) tokenizer once per reference —
    // exploding an empty array drops zero-token documents in the same
    // Generate instead, so the tokenizer runs exactly once per row
    val n = size(col("__tk"))
    // one window when n ≤ maxTokens; past that, one more per stride
    // step, the final (possibly short) window reaching exactly to n
    val nChunks = lit(1) + greatest(lit(0),
      ceil((n - maxTokens).cast("double") / stride).cast("int"))
    df.withColumn("__tk", tk)
      .select(df.columns.map(col) :+ col("__tk") :+
        explode(when(n === 0, array().cast("array<int>"))
          .otherwise(sequence(lit(0), nChunks - 1))).as("chunk"): _*)
      .withColumn("__w", slice(col("__tk"), col("chunk") * stride + 1, lit(maxTokens)))
      .select((df.columns.map(col) :+ col("chunk") :+
        array_join(col("__w"), " ").as(chunkCol) :+
        size(col("__w")).as("n_tok")): _*)
  }

  /** The windows' coverage invariant as data — per-document chunk count,
    * total window tokens, and the token count of the source document;
    * `total_tok == n_doc + (chunks − 1) · overlap` whenever chunking is
    * lossless. One aggregate over the chunk frame (for audits/manifests). */
  def chunkManifest(chunks: DataFrame, idCol: String): DataFrame =
    chunks.groupBy(col(idCol)).agg(
      count(lit(1)).as("chunks"),
      sum(col("n_tok")).as("total_tok"))

  /** Character-offset chunking — the BYTE-FIDELITY sibling of
    * [[chunkByTokens]]: windows are `substring` slices, so original
    * whitespace, casing and structure survive verbatim (token windows
    * normalize spacing by construction). Chunk `c` covers characters
    * `[c·stride, c·stride + maxChars)`, stride = `maxChars − overlap`;
    * empty documents yield zero chunks. Pure codegen arithmetic — no
    * tokenizer, no HOF, nothing interpreted anywhere in the plan.
    * Output appends `chunk`, `chunkCol` and `n_chars`. */
  def chunkByChars(df: DataFrame, textCol: String, maxChars: Int,
      overlap: Int, chunkCol: String = "chunk_text"): DataFrame = {
    require(maxChars >= 1, s"maxChars must be >= 1, got $maxChars")
    require(overlap >= 0 && overlap < maxChars,
      s"overlap must be in [0, maxChars), got $overlap for maxChars=$maxChars")
    require(!df.columns.exists(c => c == "chunk" || c == chunkCol || c == "n_chars"),
      s"chunkByChars emits columns chunk, $chunkCol, n_chars — rename the existing ones")
    val stride = maxChars - overlap
    val n = length(col(textCol))
    val nChunks = lit(1) + greatest(lit(0),
      ceil((n - maxChars).cast("double") / stride).cast("int"))
    df
      .select(df.columns.map(col) :+
        explode(when(n === 0, array().cast("array<int>"))
          .otherwise(sequence(lit(0), nChunks - 1))).as("chunk"): _*)
      .withColumn(chunkCol,
        col(textCol).substr(col("chunk") * stride + 1, lit(maxChars)))
      .withColumn("n_chars", length(col(chunkCol)))
  }

  /** Boundary-aware chunking — the RAG shape the fixed windows above
    * can't give: split on `sep` (sentence/paragraph boundaries) and
    * GREEDILY pack consecutive segments into chunks of ≤ `maxChars`
    * (joined length, separators included) WITHOUT ever splitting a
    * segment — a chunk never ends mid-sentence. A single segment longer
    * than `maxChars` becomes its own over-budget chunk (the only honest
    * option short of splitting it; documented, and the manifest makes it
    * visible). Pure per-row HOF fold (one `aggregate` with a
    * struct accumulator) + one posexplode — map-side, no shuffle; the
    * oracle replays the greedy walk as a recursive CTE. Greedy is the
    * deterministic contract here (not optimal bin count — that is
    * [[Packing.ffd]]'s job at sequence grain); chunk order preserves
    * document order, so (id, chunk) is a stable citation key. */
  def chunkBySeparator(df: DataFrame, textCol: String, sep: String,
      maxChars: Int, chunkCol: String = "chunk_text"): DataFrame = {
    require(sep.nonEmpty, "chunkBySeparator: empty separator")
    require(maxChars >= 1, s"maxChars must be >= 1, got $maxChars")
    require(!df.columns.exists(c => c == "chunk" || c == chunkCol),
      s"chunkBySeparator emits columns chunk, $chunkCol — rename the existing ones")
    val sepLen = sep.length
    val segs = split(col(textCol), java.util.regex.Pattern.quote(sep), -1)
    val packed = aggregate(
      segs,
      struct(array().cast("array<string>").as("chunks"),
        lit("").as("cur"), lit(true).as("none")),
      (acc, s) => {
        val cur = acc.getField("cur")
        val fits = length(cur) + sepLen + length(s) <= maxChars
        struct(
          when(acc.getField("none") || fits, acc.getField("chunks"))
            .otherwise(concat(acc.getField("chunks"), array(cur)))
            .as("chunks"),
          when(acc.getField("none"), s)
            .when(fits, concat(cur, lit(sep), s))
            .otherwise(s).as("cur"),
          lit(false).as("none"))
      },
      acc => when(acc.getField("none"), array().cast("array<string>"))
        .otherwise(concat(acc.getField("chunks"),
          array(acc.getField("cur")))))
    df.select(df.columns.map(col) :+
        posexplode(packed).as(Seq("chunk", chunkCol)): _*)
      .drop(textCol)
  }
}
