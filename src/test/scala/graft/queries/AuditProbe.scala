package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{LanguageModel, QualityClassifier}

object AuditProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val lm = LanguageModel.trainBigram(
      docs.filter($"lang" === "en"), "text", vocabCap = 40,
      bigramMinCount = 2, bigramCap = 1000000)
    // real docs floor
    val real = LanguageModel.scoreDocs(docs, "doc_id", "text", lm)
      .agg(min($"avg_logprob"), max($"avg_logprob")).head
    println(s"real lm min/max: $real")
    // unk gibberish
    val gib = (0 until 10).map(i =>
      (i.toLong, (1 to 90).map(j => s"qq${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    println("gib lm: " + LanguageModel.scoreDocs(gib, "doc_id", "text", lm)
      .agg(min($"avg_logprob"), max($"avg_logprob")).head)
    // spam "table"*60
    val spam = (0 until 10).map(i =>
      (i.toLong, Seq.fill(60)("table").mkString(" "))).toDF("doc_id", "text")
    println("spam lm: " + LanguageModel.scoreDocs(spam, "doc_id", "text", lm)
      .agg(min($"avg_logprob"), max($"avg_logprob")).head)
    val bad = (0 until 20).map(i =>
      (i.toLong, Seq.fill(60)("table").mkString(" "))).toDF("doc_id", "text")
    val nb = QualityClassifier.trainNb(
      docs.filter($"lang" === "en"), bad, "text", 60)
    println("real nb: " + QualityClassifier.scoreDocs(docs, "doc_id", "text", nb)
      .agg(min($"avg_logodds"), max($"avg_logodds")).head)
    println("spam nb: " + QualityClassifier.scoreDocs(spam, "doc_id", "text", nb)
      .agg(min($"avg_logodds"), max($"avg_logodds")).head)
    // token-count floor for the gopher family
    println("min words real: " + docs.select(
      min(size(graft.functions.TextAnalysis.tokens($"text")))).head)
    spark.stop()
  }
}
