package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{DsirFeatures, HashedTfCosine}

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
}
