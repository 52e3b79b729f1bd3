package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** [[Bpe]] conventions pinned against classic examples and an
  * independent driver-side segmenter: Sennrich's low/lower/newest/widest
  * dictionary (with the tie-break exercised), the overlapping-count /
  * non-overlapping-apply "aaaa" cases, early stop, the word-frequency
  * cap's total tie order, sentinel sanitization, and — the real
  * cross-check — the Spark replace-chain apply path agreeing with a
  * plain-Scala greedy segmenter on random corpora under trained merges. */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Independent reference segmenter: apply merges in training order,
    * each left-to-right non-overlapping over the symbol list. */
  private def segRef(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString).toList) { case (s, (a, b)) =>
      val out = List.newBuilder[String]
      var rest = s
      while (rest.nonEmpty) rest match {
        case x :: y :: tail if x == a && y == b => out += a + b; rest = tail
        case x :: tail => out += x; rest = tail
        case Nil =>
      }
      out.result()
    }

  test("classic dictionary trains the expected first five merges") {
    val freq = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.trainMerges(freq, numMerges = 5)
    // es/st tie at 9 → "e"+sep+"s" sorts first; lo/ow tie at 7 → l-o;
    // then lo-w at 7; then the 6-count three-way tie → e-w
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
      ("e", "w")))
  }

  test("overlapping counting, non-overlapping apply, early stop") {
    // (a,a) counts 3 in "aaaa"; apply merges to [aa, aa]; the (aa,aa)
    // pair then counts 1 < minPairCount → stop
    assert(Bpe.trainMerges(Seq("aaaa" -> 1L), 10) === Seq(("a", "a")))
    // with freq 2 the second-round pair reaches 2 and merges
    assert(Bpe.trainMerges(Seq("aaaa" -> 2L), 10) ===
      Seq(("a", "a"), ("aa", "aa")))
    assert(Bpe.trainMerges(Seq("ab" -> 1L), 10) === Seq.empty)
    assert(Bpe.trainMerges(Seq.empty, 10) === Seq.empty)
  }

  test("wordFreq caps with the (count desc, word asc) total order") {
    val docs = Seq((0L, "b b b a a c C a"), (1L, "d c")).toDF("doc_id", "text")
    // counts: a=3 b=3 c=3 (case-folded) d=1 → cap 2 keeps a, b
    assert(Bpe.wordFreq(docs, "text", 2) === Seq("a" -> 3L, "b" -> 3L))
    assert(Bpe.wordFreq(docs, "text", 100) ===
      Seq("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 1L))
  }

  test("Spark apply chain == independent segmenter on random corpora") {
    val vocab = Vector("alpha", "beta", "aaaa", "banana", "abab", "cabbage")
    val corpusGen: Gen[Seq[(Long, String)]] = for {
      n <- Gen.choose(1, 25)
      docs <- Gen.sequence[Seq[String], String]((0 until n).map { _ =>
        for {
          len <- Gen.choose(0, 12)
          toks <- Gen.listOfN(len, Gen.oneOf(vocab))
        } yield toks.mkString(" ")
      })
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    (1 to 10).foreach { seed =>
      val corpus = sample(corpusGen, seed)
      val df = corpus.toDF("doc_id", "text")
      val merges = Bpe.train(df, "text", maxWordTypes = 100,
        numMerges = sample(Gen.choose(0, 12), seed + 100))
      val got = df.select($"doc_id",
          Bpe.segmentedText($"text", merges).as("seg"),
          Bpe.bpeTokenCount($"text", merges).as("n"))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      corpus.foreach { case (id, text) =>
        val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        val refSegs = words.map(w => segRef(w, merges))
        val refText = refSegs.map(_.mkString(" ")).mkString("\n")
        val refCount = refSegs.map(_.size.toLong).sum
        assert(got(id)._1 === refText, s"seed=$seed doc=$id segmentation")
        assert(got(id)._2 === refCount, s"seed=$seed doc=$id count")
      }
    }
  }

  test("bpeSave/bpeLoad round-trips exactly; vocabulary derives correctly") {
    val freq = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.trainMerges(freq, numMerges = 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Bpe.bpeSave(spark, dir, merges)
    assert(Bpe.bpeLoad(spark, dir) === merges)
    Bpe.bpeSave(spark, dir, Seq.empty) // empty list overwrite round-trips
    assert(Bpe.bpeLoad(spark, dir) === Seq.empty)
    val vocab = Bpe.vocabulary(freq, merges)
    // base chars at ord 0, sorted; merged symbols at their 1-based rank
    assert(vocab.filter(_._2 == 0).map(_._1) ===
      Seq("d", "e", "i", "l", "n", "o", "r", "s", "t", "w"))
    assert(vocab.filter(_._2 > 0) ===
      Seq(("es", 1), ("est", 2), ("lo", 3), ("low", 4), ("ew", 5)))
  }

  test("sentinel bytes in input are stripped, not frame-corrupting") {
    val evil = "ab\u0002cd \u0001e\u0003f g\u0002\u0003h"
    val docs = Seq((0L, evil)).toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("c", "d"))
    val r = docs.select(Bpe.segmentedText($"text", merges),
      Bpe.bpeTokenCount($"text", merges)).head
    assert(r.getString(0) === "ab cd\ne f\ng h")
    assert(r.getLong(1) === 6L)
  }
}
