package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.LanguageModel

/** Dev probe: where does perplexityKeep's wall clock go at 52.5k docs?
  * sbt "Test/runMain graft.queries.KeepProbe" */
object KeepProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val docs = spark.read.parquet("/tmp/graft_sf1/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val lm = t("train")(LanguageModel.trainBigram(docs, "text",
      vocabCap = 10000, bigramMinCount = 2, bigramCap = 200000))
    val scored = LanguageModel.scoreDocs(docs, "doc_id", "text", lm)
    t("score_noop")(scored.write.format("noop").mode("overwrite").save())
    val key = scored.select(col("doc_id"), col("avg_logprob"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = t("key_count")(key.count())
    val keep = math.ceil(0.8 * n).toLong
    val thr = t("kthLargest")(graft.operators.Selection.kthLargest(
      key, "avg_logprob", keep, knownN = n))
    val cGt = t("cGt")(key.where(col("avg_logprob") > thr).count())
    val ties = key.where(col("avg_logprob") === thr)
    val tc = t("tieCount")(ties.limit(131073).count())
    println(s"[probe] n=$n keep=$keep thr=$thr cGt=$cGt ties=$tc")
    key.unpersist(false)
    val kept = t("final_filter_count")(
      scored.filter(col("avg_logprob") >= thr).count())
    println(s"[probe] kept=$kept")
    val t0 = System.nanoTime()
    val viaOp = LanguageModel.perplexityKeep(
      LanguageModel.scoreDocs(docs, "doc_id", "text", lm), "doc_id", 0.8)
    println(f"[probe] perplexityKeep_build    ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    val t1 = System.nanoTime()
    println(s"[probe] viaOp=${viaOp.count()}")
    println(f"[probe] perplexityKeep_count    ${(System.nanoTime() - t1) / 1e9}%7.2f s")
    spark.stop()
  }
}
