package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked-retrieval evaluation metrics — recall@k, MRR, nDCG@k — as
  * declarative DataFrame operators: the measurement half of a search
  * stack ([[TextRetrieval]]/[[Search]]/[[Ann]] produce ranked lists,
  * these grade them against a truth set). The operator recall checks the
  * ANN specs run ad hoc become reusable, and search-quality tracking over
  * a 100-TB corpus is the same one plan: both sides are (query, doc)
  * tables, the join keys are (query, doc), and every aggregation is
  * per-query then global — two partial-agg shuffles, no driver loops.
  *
  * Inputs: `results` as (queryIdCol, idCol, rankCol) with rank 1-based
  * (use [[TextRetrieval.rankByScore]] or a `WindowGroupLimit` rank);
  * `truth` as (queryIdCol, idCol). Rows ranked past `k` are ignored.
  * Queries present in `truth` but absent from `results` score 0 — a
  * retrieval that returns nothing for a query must not be graded only on
  * the queries it answered.
  *
  * Determinism: every metric is a pure function of integer ranks and set
  * memberships (rational arithmetic + log2 for nDCG), so engines agree to
  * rounding; each has a DuckDB oracle in
  * [[graft.queries.RetrievalQueries]].
  */
object RetrievalEval {

  import TextRetrieval.RankCol

  private def perQueryBase(results: DataFrame, truth: DataFrame,
      queryIdCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val res = results.where(col(RankCol) <= k)
      .select(col(queryIdCol), col(idCol), col(RankCol))
    val tru = truth.select(col(queryIdCol), col(idCol)).distinct()
    // one row per truth item, with the rank it was retrieved at (null =
    // missed); right-side queries with zero retrieved rows survive
    res.join(tru, Seq(queryIdCol, idCol), "right_outer")
  }

  /** Per-query recall@k = |retrieved@k ∩ truth| / |truth|. Returns
    * (queryIdCol, recall). */
  def recallAtK(results: DataFrame, truth: DataFrame, queryIdCol: String,
      idCol: String, k: Int): DataFrame =
    perQueryBase(results, truth, queryIdCol, idCol, k)
      .groupBy(col(queryIdCol))
      .agg((sum(col(RankCol).isNotNull.cast("long")).cast("double") /
        count(lit(1))).as("recall"))

  /** Per-query reciprocal rank: 1 / (rank of the FIRST truth item in the
    * results, ≤ k), 0.0 when none retrieved. Mean over queries = MRR.
    * Returns (queryIdCol, rr). */
  def reciprocalRank(results: DataFrame, truth: DataFrame,
      queryIdCol: String, idCol: String, k: Int): DataFrame =
    perQueryBase(results, truth, queryIdCol, idCol, k)
      .groupBy(col(queryIdCol))
      .agg(coalesce(lit(1.0) / min(col(RankCol)), lit(0.0)).as("rr"))

  /** Per-query nDCG@k with binary relevance: DCG = Σ 1/log2(rank+1) over
    * retrieved truth items at rank ≤ k, ideal DCG = the same sum over
    * ranks 1..min(|truth|, k). Returns (queryIdCol, ndcg). */
  def ndcgAtK(results: DataFrame, truth: DataFrame, queryIdCol: String,
      idCol: String, k: Int): DataFrame = {
    val base = perQueryBase(results, truth, queryIdCol, idCol, k)
    val dcgTerm = when(col(RankCol).isNotNull,
      lit(1.0) / log2(col(RankCol) + 1.0)).otherwise(lit(0.0))
    val perQ = base.groupBy(col(queryIdCol))
      .agg(sum(dcgTerm).as("__dcg"), count(lit(1)).as("__nt"))
    // ideal DCG over ranks 1..min(|truth|, k): a tiny per-query sequence —
    // aggregate(sequence(...)) keeps it codegen'd, no explode
    val ideal = aggregate(
      sequence(lit(1), least(col("__nt"), lit(k)).cast("int")),
      lit(0.0),
      (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1.0))
    perQ.select(col(queryIdCol),
      when(ideal > 0, col("__dcg") / ideal).otherwise(lit(0.0)).as("ndcg"))
  }

  /** Mean of a per-query metric column over all queries — the corpus-level
    * summary figure (MRR, mean recall, mean nDCG). One row. */
  def mean(perQuery: DataFrame, metricCol: String): DataFrame =
    perQuery.agg(avg(col(metricCol)).as(metricCol))

  private def log2(c: Column): Column = log(c) / log(lit(2.0))
}
