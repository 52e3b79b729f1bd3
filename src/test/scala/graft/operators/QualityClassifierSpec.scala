package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** [[QualityClassifier]] against an independent plain-Scala Naive-Bayes
  * reference: model counts and the vocab cap's total tie order, add-one
  * log-odds arithmetic with the position-ordered fold, the
  * ignore-unknown-token contract, zero-hit docs, and separation on a
  * constructed good/bad corpus pair. */
class QualityClassifierSpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val goodV = Vector("alpha", "beta", "gamma", "delta")
  private val badV = Vector("spamword", "junktoken", "noise", "beta")

  private def corpusGen(v: Vector[String], base: Long): Gen[Seq[(Long, String)]] =
    for {
      n <- Gen.choose(2, 20)
      docs <- Gen.sequence[Seq[String], String]((0 until n).map { _ =>
        for {
          len <- Gen.choose(1, 15)
          toks <- Gen.listOfN(len, Gen.oneOf(v))
        } yield toks.mkString(" ")
      })
    } yield docs.zipWithIndex.map { case (t, i) => (base + i, t) }

  private def tok(t: String): Seq[String] =
    graft.functions.TextHash.WS.split(t.toLowerCase).toSeq.filter(_.nonEmpty)

  private def refTrain(good: Seq[String], bad: Seq[String],
      cap: Int): QualityClassifier.NbModel = {
    def cnt(xs: Seq[String]) = xs.flatMap(tok)
      .groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val gc = cnt(good); val bc = cnt(bad)
    val rows = (gc.keySet ++ bc.keySet).toSeq
      .map(t => (t, gc.getOrElse(t, 0L), bc.getOrElse(t, 0L)))
      .sortBy { case (t, g, b) => (-(g + b), t) }.take(cap)
    QualityClassifier.NbModel(rows.sortBy(_._1),
      gc.values.sum, bc.values.sum, cap)
  }

  private def refScore(m: QualityClassifier.NbModel, text: String): (Int, Double) = {
    val terms = m.terms.map(t => t._1 -> ((t._2, t._3))).toMap
    val v = m.vocabSize.toDouble
    val hits = tok(text).flatMap(w => terms.get(w).map { case (cg, cb) =>
      math.log((cg + 1d) / (m.goodTotal + v)) -
        math.log((cb + 1d) / (m.badTotal + v))
    })
    (hits.size, hits.foldLeft(0d)(_ + _))
  }

  test("model and scores == plain-Scala reference on random corpora") {
    (1 to 12).foreach { seed =>
      val good = sample(corpusGen(goodV, 0L), seed)
      val bad = sample(corpusGen(badV, 1000L), seed + 99)
      val cap = sample(Gen.choose(2, 8), seed + 500)
      val m = QualityClassifier.trainNb(
        good.toDF("doc_id", "text"), bad.toDF("doc_id", "text"), "text", cap)
      val ref = refTrain(good.map(_._2), bad.map(_._2), cap)
      assert(m === ref, s"model seed=$seed")
      val mix = good ++ bad ++ Seq((5000L, "unseen words only"), (5001L, ""))
      val got = QualityClassifier.scoreDocs(
          mix.toDF("doc_id", "text"), "doc_id", "text", m)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
      mix.foreach { case (id, text) =>
        val (n, lo) = refScore(ref, text)
        assert(got(id)._1 === n, s"n_hit id=$id seed=$seed")
        assert(math.abs(got(id)._2 - lo) < 1e-9, s"logodds id=$id seed=$seed")
      }
    }
  }

  test("separation: good-corpus docs score positive, bad negative") {
    val good = (0 until 20).map(i => (i.toLong, "alpha beta gamma delta alpha"))
    val bad = (0 until 20).map(i => (100L + i, "spamword junktoken noise spamword"))
    val m = QualityClassifier.trainNb(
      good.toDF("doc_id", "text"), bad.toDF("doc_id", "text"), "text", 100)
    val s = QualityClassifier.scoreDocs(
        (good ++ bad).toDF("doc_id", "text"), "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    good.foreach { case (id, _) => assert(s(id) > 0, s"good $id: ${s(id)}") }
    bad.foreach { case (id, _) => assert(s(id) < 0, s"bad $id: ${s(id)}") }
  }

  test("nbSave/nbLoad round-trips exactly; loaded model scores identically") {
    val good = Seq((0L, "alpha beta alpha gamma"))
    val bad = Seq((1L, "noise junktoken noise"))
    val m = QualityClassifier.trainNb(
      good.toDF("doc_id", "text"), bad.toDF("doc_id", "text"), "text", 10)
    val dir = java.nio.file.Files.createTempDirectory("graft-nb").toString
    QualityClassifier.nbSave(spark, dir, m)
    val m2 = QualityClassifier.nbLoad(spark, dir)
    assert(m2 === m)
    val probe = Seq((9L, "alpha noise zzz")).toDF("doc_id", "text")
    val a = QualityClassifier.scoreDocs(probe, "doc_id", "text", m).head
    val b = QualityClassifier.scoreDocs(probe, "doc_id", "text", m2).head
    assert(a === b)
  }

  test("unknown tokens contribute nothing; zero-hit docs score 0") {
    val m = QualityClassifier.trainNb(
      Seq((0L, "alpha beta")).toDF("doc_id", "text"),
      Seq((1L, "noise")).toDF("doc_id", "text"), "text", 10)
    val r = QualityClassifier.scoreDocs(
        Seq((2L, "alpha zzz qqq"), (3L, "zzz qqq"), (4L, "")).toDF("doc_id", "text"),
        "doc_id", "text", m)
      .collect().map(x => x.getLong(0) -> ((x.getInt(1), x.getDouble(2)))).toMap
    assert(r(2L)._1 === 1)
    assert(r(3L) === ((0, 0d)))
    assert(r(4L) === ((0, 0d)))
  }
}
