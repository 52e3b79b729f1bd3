package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** ScalaCheck properties for [[Dedup.stripHotSpans]] over generated
  * small-vocabulary corpora (seeded — reproducible), checked against an
  * in-memory reference: tokenize → df over DISTINCT docs per n-gram →
  * cover every position inside a hot gram's window → rebuild. A tiny
  * vocabulary forces organic hot grams, overlapping hot windows, repeated
  * grams within one doc, and sub-n docs — the edge surface the hand-built
  * fixture cannot enumerate. */
class StripSpansPropertySpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ~8-word vocabulary, docs of 0..14 tokens: with 40 docs, many 2-grams
  // recur across docs (hot), some docs repeat a gram internally, and some
  // docs are shorter than n
  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    nDocs <- Gen.choose(5, 40)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(0, 14)
      toks <- Gen.listOfN(len, Gen.oneOf(
        "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"))
    } yield toks.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  /** Reference implementation (plain Scala, mirrors the documented
    * contract, not the Spark plan). */
  private def reference(corpus: Seq[(Long, String)], n: Int,
      minDf: Long): Map[Long, String] = {
    def toks(t: String): Vector[String] =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).toVector
    val grams: Seq[(Long, Int, String)] = corpus.flatMap { case (id, t) =>
      val tk = toks(t)
      if (tk.length < n) Seq.empty
      else (0 to tk.length - n).map(i => (id, i, tk.slice(i, i + n).mkString(" ")))
    }
    val df = grams.map { case (id, _, g) => (id, g) }.distinct
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val hot = df.filter(_._2 >= minDf).keySet
    val covered: Map[Long, Set[Int]] = grams
      .filter { case (_, _, g) => hot(g) }
      .flatMap { case (id, p, _) => (p until p + n).map(id -> _) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    corpus.map { case (id, t) =>
      val tk = toks(t)
      val cov = covered.getOrElse(id, Set.empty)
      id -> tk.zipWithIndex.collect { case (w, i) if !cov(i) => w }.mkString(" ")
    }.toMap
  }

  test("stripHotSpans == reference on random corpora (n=2 and n=3)") {
    for (seed <- Seq(3L, 17L, 55L, 101L); n <- Seq(2, 3)) {
      val corpus = sample(corpusGen, seed)
      val expect = reference(corpus, n, minDf = 3L)
      val got = Dedup.stripHotSpans(corpus.toDF("doc_id", "text"),
          "doc_id", "text", n = n, minDf = 3L)
        .as[(Long, String)].collect().toMap
      assert(got.keySet == corpus.map(_._1).toSet, s"seed $seed n=$n row set")
      val diff = expect.collect {
        case (id, e) if got(id) != e => (id, e, got(id)) }
      assert(diff.isEmpty, s"seed $seed n=$n first diffs: ${diff.take(3)}")
    }
  }
}
