package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{DsirFeatures, HashedTfCosine, HashedTfCosineMulti, HashedTfCosineStored, HashedTfCounts}

/** Embedding-free text similarity — hashed-TF (hashing-trick) gram-count
  * vectors and exact cosine top-k over them. The bridge between the text
  * family and the vector family: "find documents like this one" with no
  * embedding model in the loop, the classical sparse-retrieval
  * complement to BM25 (whole-document similarity rather than
  * keyword match).
  *
  * Exactness by construction: counts are INTEGERS, so the dot product
  * and both squared norms are exact integer sums — order-independent —
  * and the cosine is three correctly-rounded IEEE ops on top
  * (`dot / (√a² · √q²)`). A DuckDB oracle replays it bit-for-bit with no
  * fold-order discipline needed (unlike every log-sum score in the LM
  * family). Feature space and hash are [[DsirFeatures]]' (unigrams +
  * bigrams, mult-31 poly mod dim).
  *
  * Scale shape: one codegen map pass (the query counts ride the
  * expression — broadcast-model), then a bounded top-k. No shuffle, no
  * stored state; for repeated querying at scale, store the counts once
  * and probe like [[Ann.rpSearchEncoded]]. */
object TextVector {

  /** Driver-side hashed counts of one query text — the SAME kernel the
    * per-row expression runs, so query and corpus featurize identically. */
  def hashedCounts(text: String, dim: Int): Array[Int] = {
    require(dim >= 2 && dim <= Dsir.MaxBuckets,
      s"dim must be in [2, ${Dsir.MaxBuckets}], got $dim")
    DsirFeatures.bucketCountsDense(UTF8String.fromString(text), dim)
  }

  /** Top-k documents by hashed-TF cosine against `queryText`. Returns
    * (idCol, cos), cosine descending, ties by id ascending; zero-overlap
    * (and zero-gram) documents are dropped. The caller excludes the
    * query document itself if it lives in `docs`. */
  def cosineTopK(docs: DataFrame, idCol: String, textCol: String,
      queryText: String, dim: Int, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val q = hashedCounts(queryText, dim)
    // top-k first, positivity cut above it (the [[TextRetrieval.bm25]]
    // ordering: semantically identical, and the filter cannot be pushed
    // through the limit to re-evaluate the kernel twice)
    docs.select(col(idCol), HashedTfCosine(col(textCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .where(col("cos") > 0)
  }

  /** Encode once: the per-document SPARSE count vector as a stored
    * `array<int>` column (`[buckets…, counts…]` — see
    * [[DsirFeatures.bucketCountsSparse]]; ~2·tokens ints per row, ~35×
    * smaller than dense at the default dim — the sq8-codes / rpEncode
    * discipline). A probe over the encoded table scans those ints —
    * no tokenization, no gram hashing — and is bit-identical to the
    * fresh path because counts are a pure function of the text. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      dim: Int, countsCol: String = "tf_counts"): DataFrame = {
    require(dim >= 2 && dim <= Dsir.MaxBuckets,
      s"dim must be in [2, ${Dsir.MaxBuckets}], got $dim")
    require(!docs.columns.contains(countsCol),
      s"encode emits '$countsCol'; rename the existing column")
    docs.select(col(idCol), HashedTfCounts(col(textCol), dim).as(countsCol))
  }

  /** [[cosineTopK]] over an [[encode]]d table. */
  def cosineTopKEncoded(encoded: DataFrame, idCol: String, countsCol: String,
      queryText: String, dim: Int, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val q = hashedCounts(queryText, dim)
    encoded.select(col(idCol), HashedTfCosineStored(col(countsCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .where(col("cos") > 0)
  }

  /** Query-batch ceiling: the batch's count vectors ride the expression
    * (dim ints each) — a mis-passed corpus must fail loudly, never
    * serialize gigabytes into every task (the `maxQueryTerms` /
    * `MaxCentroids` convention). */
  val MaxBatchQueries: Int = 1024

  /** Top-k per query for a BATCH of query texts: ONE tokenize+count per
    * document scores the whole batch (an `array<double>` kernel), then
    * per-query ranking runs as a rank-filter the optimizer executes as
    * WindowGroupLimit partial top-k — the narrow (query, id, cos) frame
    * is all that shuffles. Returns (query_id, idCol, cos), rank ≤ k per
    * query, zero-overlap rows dropped. */
  def cosineTopKMulti(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, String)], dim: Int, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(queries.nonEmpty, "empty query batch")
    require(queries.size <= MaxBatchQueries,
      s"${queries.size} queries exceed MaxBatchQueries=$MaxBatchQueries — " +
        "the batch rides every task; split the batch or probe an encoded table")
    val qs = queries.map(q => hashedCounts(q._2, dim)).toArray
    val qids = queries.map(_._1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__qi")).orderBy(col("cos").desc, col(idCol).asc)
    docs
      .select(Seq(col(idCol),
        posexplode(HashedTfCosineMulti(col(textCol), qs)).as(Seq("__qi", "cos"))): _*)
      .withColumn("__rnk", row_number().over(w))
      .where(col("__rnk") <= k && col("cos") > 0)
      .select(element_at(typedLit(qids), col("__qi") + 1).as("query_id"),
        col(idCol), col("cos"))
  }
}
