package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Dedup, Search, SearchConfig}

/** Scratch probe (dev-only): measured recall of every approximate search
  * path vs its exact twin at a given SF — the numbers that calibrate the
  * in-query recall bands (VERDICT r4 #3). Run:
  * sbt "Test/runMain graft.queries.RecallProbe /root/testdata/sf0.01" */
object RecallProbe {
  private def cfg = SearchConfig(
    scoreFuncName = "VectorDistance", higherIsBetter = false, limit = 10,
    featureCol = "embedding", keyCols = Seq("vec_id"), tieBreakCol = Some("vec_id"),
    assumeUniqueKeys = true)

  def meanRecall(approx: DataFrame, exact: DataFrame): (Long, Double, Double) = {
    val a = approx.select(col(Search.QueryIdCol).as("q"), col("vec_id"))
    val e = exact.select(col(Search.QueryIdCol).as("q"), col("vec_id"))
    val hit = a.join(e, Seq("q", "vec_id")).groupBy("q").agg(count(lit(1)).as("hits"))
    val per = e.groupBy("q").agg(count(lit(1)).as("n_exact"))
      .join(hit, Seq("q"), "left")
      .select(col("q"), (coalesce(col("hits"), lit(0L)).cast("double") / col("n_exact")).as("r"))
    val row = per.agg(count(lit(1)), avg(col("r")), min(col("r"))).head
    (row.getLong(0), row.getDouble(1), row.getDouble(2))
  }

  /** how many queries have themselves as top-1 with score 0 */
  def selfTop1(approx: DataFrame): (Long, Long) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(Search.QueryIdCol)
      .orderBy(col(Search.ScoreCol).asc, col("vec_id").asc)
    val top = approx.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
    val ok = top.filter(col("vec_id") === col(Search.QueryIdCol) &&
      col(Search.ScoreCol) === 0.0).count()
    (ok, top.count())
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local()
    val emb = Tables(spark, dir, "embeddings")
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val qv = emb.filter(col("vec_id") === 0).select("embedding").head.getSeq[Float](0)
    val queries = emb.filter(col("vec_id") < 100)
      .select(col("vec_id").as(Search.QueryIdCol), col("embedding"))
    def one(df: DataFrame) = df.withColumn(Search.QueryIdCol, lit(0L))

    val exact1 = one(Search.search(emb, qv, cfg))
    val exactB5 = Search.multiSearch(emb, queries, cfg.copy(limit = 5))

    val (indexed, centroids) = Ann.ivfBuild(emb, "embedding", k = 8, normalize = false)
    indexed.cache().count()

    println(s"== $dir dim=$dim")
    def rep(name: String, approx: DataFrame, exact: DataFrame): Unit = {
      val a = approx.cache()
      val (n, mean, mn) = meanRecall(a, exact)
      val (sOk, sN) = selfTop1(a)
      println(f"$name%-16s n=$n%4d meanRecall=$mean%.3f minRecall=$mn%.3f selfTop1=$sOk/$sN")
      a.unpersist()
    }
    rep("lsh_knn", one(Ann.lshSearch(emb, qv, cfg)), exact1)
    rep("ivf_knn", one(Ann.ivfSearch(indexed, centroids, qv, cfg, nProbe = 4)), exact1)
    rep("ivf_multi",
      Ann.ivfMultiSearch(indexed, centroids, queries, cfg.copy(limit = 5), nProbe = 4),
      exactB5)
    val cb = Ann.pqTrain(emb, "embedding", m = 8, ksub = 16)
    val pqEnc = Ann.pqEncode(indexed, "embedding", cb).cache()
    pqEnc.count()
    rep("ivfpq_multi",
      Ann.ivfPqMultiSearch(pqEnc, centroids, cb, queries, cfg.copy(limit = 5),
        nProbe = 4, refine = 8),
      exactB5)
    val sq8Enc = Ann.sq8Encode(indexed, "embedding").cache()
    sq8Enc.count()
    rep("ivfsq8_multi",
      Ann.ivfSq8MultiSearch(sq8Enc, centroids, queries, cfg.copy(limit = 5),
        nProbe = 4, refine = 4),
      exactB5)
    rep("pq_knn", one(Ann.pqSearch(Ann.pqEncode(emb, "embedding", cb), cb, qv, cfg, refine = 8)),
      exact1)
    rep("lsh_multi",
      Ann.lshMultiSearch(emb, queries, cfg.copy(limit = 5),
        Dedup.hyperplanes(dim, count = 16), bands = 4),
      exactB5)
    spark.stop()
  }
}
