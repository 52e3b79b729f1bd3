package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Search, SearchConfig}

/** ANN operators (SURVEY.md §2.4 J2) as driver queries. No SQL oracle —
  * approximate recall is spec-tested against the exact scan (AnnSpec), the
  * reference's own stance for Annoy parity (SURVEY §7 risks). */
object AnnQueries {

  private def cfg = SearchConfig(
    scoreFuncName = "VectorDistance", higherIsBetter = false, limit = 10,
    featureCol = "embedding", keyCols = Seq("vec_id"), tieBreakCol = Some("vec_id"),
    assumeUniqueKeys = true)

  private def queryVec(s: SparkSession, dir: String): Seq[Float] =
    Tables(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0)

  private def lsh(s: SparkSession, dir: String): DataFrame =
    Ann.lshSearch(Tables(s, dir, "embeddings"), queryVec(s, dir), cfg)
      .select(col("vec_id"), round(col(Search.ScoreCol), 6).as("score"))

  private def ivf(s: SparkSession, dir: String): DataFrame = {
    val (indexed, centroids) =
      Ann.ivfBuild(Tables(s, dir, "embeddings"), "embedding", k = 8, normalize = false)
    Ann.ivfSearch(indexed, centroids, queryVec(s, dir), cfg, nProbe = 4)
      .select(col("vec_id"), round(col(Search.ScoreCol), 6).as("score"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_lsh_knn" -> (lsh _),
    "ann_ivf_knn" -> (ivf _))

  def oracle: Map[String, String] = Map.empty
}
