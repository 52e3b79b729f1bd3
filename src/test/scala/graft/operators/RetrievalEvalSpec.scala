package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RetrievalEvalSpec extends SparkTestBase {
  import spark.implicits._

  // query 1: truth {10, 20, 30}, retrieved ranks: 10→1, 30→4 (20 missed)
  // query 2: truth {40}, nothing retrieved at all
  // query 3: truth {50, 60}, retrieved 50→2 but at rank 11 (past k=10): 60→11 ignored
  private def results = Seq(
    (1L, 10L, 1), (1L, 99L, 2), (1L, 98L, 3), (1L, 30L, 4),
    (3L, 50L, 2), (3L, 60L, 11)).toDF("query_id", "doc_id", "rank")
  private def truth = Seq(
    (1L, 10L), (1L, 20L), (1L, 30L),
    (2L, 40L),
    (3L, 50L), (3L, 60L)).toDF("query_id", "doc_id")

  private def byQ(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("recallAtK: hits over truth size; unanswered queries score 0; ranks past k ignored") {
    val r = byQ(RetrievalEval.recallAtK(results, truth, "query_id", "doc_id", 10))
    assert(r.keySet == Set(1L, 2L, 3L))
    assert(math.abs(r(1L) - 2.0 / 3) < 1e-15)
    assert(r(2L) == 0.0)
    assert(math.abs(r(3L) - 0.5) < 1e-15) // 60 retrieved at rank 11 > k
  }

  test("reciprocalRank: first truth hit; 0 when none") {
    val r = byQ(RetrievalEval.reciprocalRank(results, truth, "query_id", "doc_id", 10))
    assert(r(1L) == 1.0)        // doc 10 at rank 1
    assert(r(2L) == 0.0)
    assert(r(3L) == 0.5)        // doc 50 at rank 2
  }

  test("ndcgAtK: hand-computed binary-relevance DCG over ideal") {
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val r = byQ(RetrievalEval.ndcgAtK(results, truth, "query_id", "doc_id", 10))
    // q1: dcg = 1/log2(2) + 1/log2(5); idcg = 1/log2(2)+1/log2(3)+1/log2(4)
    val want1 = (1 / log2(2) + 1 / log2(5)) / (1 / log2(2) + 1 / log2(3) + 1 / log2(4))
    assert(math.abs(r(1L) - want1) < 1e-12, s"${r(1L)} vs $want1")
    assert(r(2L) == 0.0)
    // q3: dcg = 1/log2(3); idcg = 1/log2(2) + 1/log2(3)
    val want3 = (1 / log2(3)) / (1 / log2(2) + 1 / log2(3))
    assert(math.abs(r(3L) - want3) < 1e-12)
  }

  test("ndcgAtK: ideal truncates at k (more truth than k)") {
    val res = Seq((1L, 0L, 1)).toDF("query_id", "doc_id", "rank")
    val tru = (0L until 5L).map(i => (1L, i)).toDF("query_id", "doc_id")
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val r = byQ(RetrievalEval.ndcgAtK(res, tru, "query_id", "doc_id", 2))
    // ideal = ranks 1..min(5, 2); dcg = 1/log2(2) = 1
    val want = 1.0 / (1 / log2(2) + 1 / log2(3))
    assert(math.abs(r(1L) - want) < 1e-12)
  }

  test("mean: the corpus-level summary over per-query rows") {
    val r = RetrievalEval.mean(
      RetrievalEval.reciprocalRank(results, truth, "query_id", "doc_id", 10), "rr")
      .head().getDouble(0)
    assert(math.abs(r - (1.0 + 0.0 + 0.5) / 3) < 1e-15)
    intercept[IllegalArgumentException](
      RetrievalEval.recallAtK(results, truth, "query_id", "doc_id", 0))
  }

  test("end-to-end: grade a BM25 list against a cosine-kNN truth set") {
    // the production shape: one ranked list per retriever over the same ids
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha alpha"), (3L, "gamma delta"),
      (4L, "beta beta alpha")).toDF("doc_id", "text")
    val lex = TextRetrieval.rankByScore(
      TextRetrieval.bm25(docs, "doc_id", "text", Seq("alpha"), k = 3), "doc_id")
      .withColumn("query_id", lit(0L))
    val tru = Seq((0L, 2L), (0L, 4L)).toDF("query_id", "doc_id")
    val rec = byQ(RetrievalEval.recallAtK(lex, tru, "query_id", "doc_id", 3))
    assert(rec(0L) == 1.0) // docs 2 and 4 both contain alpha and rank in top-3
  }
}
