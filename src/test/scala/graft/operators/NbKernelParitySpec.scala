package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** r13: [[QualityClassifier.scoreDocs]] runs the map-side
  * [[graft.functions.NbKernel]] walk; [[QualityClassifier
  * .scoreDocsExpanded]] keeps the explode + broadcast-join + fold
  * spelling as the executable spec. Pins BIT-exact equality on corpora
  * exercising vocab hits, misses, all-miss docs, empty docs, repeated
  * hot tokens, and passthrough. */
class NbKernelParitySpec extends SparkTestBase {
  import spark.implicits._

  private def model = QualityClassifier.trainNb(
    Seq((1L, "good clean prose flows well"),
      (2L, "clean prose reads well here")).toDF("id", "text"),
    Seq((1L, "spam spam buy now spam"),
      (2L, "buy now now now")).toDF("id", "text"),
    "text", vocabCap = 8)

  private def corpus = Seq(
    (1L, "clean prose with spam inside"),
    (2L, "entirely novel tokens zzz qqq"), // all-miss: n_hit 0, 0.0
    (3L, ""),                              // zero tokens
    (4L, "spam spam spam"),                // repeated hot token
    (5L, "buy clean now well prose")
  ).toDF("doc_id", "text")

  test("kernel scoreDocs == expanded spec, bit-exact") {
    val m = model
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_hit", "logodds", "avg_logodds").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    val kernel = rows(QualityClassifier.scoreDocs(corpus, "doc_id", "text", m))
    val spec = rows(QualityClassifier.scoreDocsExpanded(corpus, "doc_id", "text", m))
    assert(kernel == spec, s"kernel=$kernel\nspec=$spec")
    assert(kernel.size == 5)
  }

  test("passthrough columns ride the kernel path") {
    val m = model
    val got = QualityClassifier.scoreDocs(
        corpus.withColumn("src", lit("web")), "doc_id", "text", m,
        passthrough = Seq("src"))
      .select("doc_id", "src", "avg_logodds").collect()
    assert(got.length == 5 && got.forall(_.getString(1) == "web"))
  }
}
