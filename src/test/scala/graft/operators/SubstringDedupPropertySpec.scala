package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** ScalaCheck properties for [[Dedup.dedupSubstrings]] over generated
  * small-vocabulary corpora, checked against an in-memory reference:
  * tokenize → per-gram global first occurrence by (id, pos) → cover every
  * position inside a LATER occurrence's window → span-preserving rebuild.
  * The tiny vocabulary forces the interesting shapes organically: the
  * same gram at several positions WITHIN one doc (the first owns, the
  * rest strip), chains of overlapping duplicated grams merging into one
  * span, partially-owned passages (a doc whose copy of a passage is first
  * for some grams and later for others), plus the casing/separator
  * fidelity surface shared with [[StripSpansPropertySpec]]. */
class SubstringDedupPropertySpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    nDocs <- Gen.choose(5, 40)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(0, 14)
      toks <- Gen.listOfN(len, for {
        w <- Gen.oneOf("alpha", "beta", "gamma", "delta")
        up <- Gen.oneOf(true, false)
      } yield if (up) w.toUpperCase else w)
      seps <- Gen.listOfN(math.max(len - 1, 0),
        Gen.oneOf(" ", "  ", "\t", " \t ", "\n"))
      lead <- Gen.oneOf("", " ", "\t ")
      trail <- Gen.oneOf("", " ", "\n")
    } yield
      if (toks.isEmpty) lead + trail
      else lead + toks.head + seps.zip(toks.tail).map { case (s, t) => s + t }.mkString + trail)
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private val NonWs = "[^ \t\n\f\r]+".r

  /** Plain-Scala reference of the documented contract. */
  private def reference(corpus: Seq[(Long, String)], n: Int): Map[Long, String] = {
    def spans(t: String): Vector[(String, Int, Int)] =
      NonWs.findAllMatchIn(t).map(m => (m.matched, m.start, m.end)).toVector
    val grams: Seq[(Long, Int, String)] = corpus.flatMap { case (id, t) =>
      val tk = spans(t).map(_._1.toLowerCase)
      if (tk.length < n) Seq.empty
      else (0 to tk.length - n).map(i => (id, i, tk.slice(i, i + n).mkString(" ")))
    }
    val first: Map[String, (Long, Int)] = grams
      .groupBy(_._3).view
      .mapValues(os => os.map { case (id, p, _) => (id, p) }.min).toMap
    val multi: Set[String] =
      grams.groupBy(_._3).view.filter(_._2.size >= 2).keys.toSet
    val covered: Map[Long, Set[Int]] = grams
      .filter { case (id, p, g) => multi(g) && first(g) != ((id, p)) }
      .flatMap { case (id, p, _) => (p until p + n).map(id -> _) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    corpus.map { case (id, t) =>
      covered.get(id) match {
        case None => id -> t
        case Some(cov) =>
          val sp = spans(t)
          val kept = sp.indices.filterNot(cov)
          val (acc, _) = kept.foldLeft(("", -1)) { case ((a, prev), i) =>
            val sep =
              if (prev < 0) ""
              else if (i == prev + 1) t.substring(sp(prev)._3, sp(i)._2)
              else " "
            (a + sep + sp(i)._1, i)
          }
          id -> acc
      }
    }.toMap
  }

  test("dedupSubstrings == reference on random cased/spaced corpora (n=2 and n=3)") {
    for (seed <- Seq(7L, 23L, 61L, 113L); n <- Seq(2, 3)) {
      val corpus = sample(corpusGen, seed)
      val expect = reference(corpus, n)
      val got = Dedup.dedupSubstrings(corpus.toDF("doc_id", "text"),
          "doc_id", "text", n = n)
        .as[(Long, String)].collect().toMap
      assert(got.keySet == corpus.map(_._1).toSet, s"seed $seed n=$n row set")
      val diff = expect.collect {
        case (id, e) if got(id) != e => (id, e, got(id)) }
      assert(diff.isEmpty, s"seed $seed n=$n first diffs: ${diff.take(3)}")
    }
  }

  test("within-doc repeat: first occurrence owns, later one strips") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta alpha beta gamma"), // 'alpha beta gamma' twice
      (2L, "delta delta beta"))
    val got = Dedup.dedupSubstrings(corpus.toDF("doc_id", "text"),
        "doc_id", "text", n = 3)
      .as[(Long, String)].collect().toMap
    // later window [4,6] strips; tokens 0-3 survive (delta at 3 is inside
    // no LATER duplicated window)
    assert(got(1L) == "alpha beta gamma delta")
    assert(got(2L) == "delta delta beta")
  }

  test("cross-doc passage: later doc keeps only its unique surround") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "UNIQ1 alpha beta gamma delta UNIQ2"))
    val got = Dedup.dedupSubstrings(corpus.toDF("doc_id", "text"),
        "doc_id", "text", n = 2)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "alpha beta gamma delta", "owner untouched")
    assert(got(2L) == "UNIQ1 UNIQ2", "embedded passage strips, surround survives")
  }
}
