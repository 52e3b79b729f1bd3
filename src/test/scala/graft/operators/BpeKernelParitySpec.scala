package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Differential parity of the two [[Bpe]] apply paths: the single-pass
  * rank-table kernel ([[graft.functions.BpeSegment]]) must equal the
  * literal replace chain bit-for-bit — on trained merge lists, on
  * ADVERSARIAL hand-built lists (out-of-order derivations, duplicate
  * pairs whose second occurrence genuinely fires), on non-BMP text, and
  * through [[Bpe.segmentTokens]]'s dispatch at merge counts the chain
  * could never reach (B-invariance: padding a list with merges that
  * cannot apply changes nothing). */
class BpeKernelParitySpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Both paths + count over one corpus; returns per-doc (chain, kernel,
    * chainCount, kernelCount). */
  private def runBoth(corpus: Seq[(Long, String)],
      merges: Seq[(String, String)]): Unit = {
    val df = corpus.toDF("doc_id", "text")
    val got = df.select($"doc_id",
        array_join(Bpe.segmentTokensChain($"text", merges), "|").as("c"),
        array_join(Bpe.segmentTokensKernel($"text", merges), "|").as("k"))
      .collect()
    got.foreach { r =>
      assert(r.getString(1) === r.getString(2),
        s"doc ${r.getLong(0)} diverged under merges=$merges")
    }
  }

  private def array_join(c: org.apache.spark.sql.Column, sep: String) =
    org.apache.spark.sql.functions.array_join(c, sep)

  test("kernel == chain on random corpora under trained merges") {
    val vocab = Vector("alpha", "beta", "aaaa", "banana", "abab", "cabbage",
      "deed", "added")
    val corpusGen: Gen[Seq[(Long, String)]] = for {
      n <- Gen.choose(1, 20)
      docs <- Gen.sequence[Seq[String], String]((0 until n).map { _ =>
        for {
          len <- Gen.choose(0, 10)
          toks <- Gen.listOfN(len, Gen.oneOf(vocab))
        } yield toks.mkString(" ")
      })
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    (1 to 8).foreach { seed =>
      val corpus = sample(corpusGen, seed)
      val merges = Bpe.train(corpus.toDF("doc_id", "text"), "text",
        maxWordTypes = 100, numMerges = sample(Gen.choose(0, 15), seed + 50),
        minPairCount = 1L)
      runBoth(corpus, merges)
    }
  }

  test("kernel == chain on adversarial merge lists") {
    val corpus = Seq((0L, "abc abcd aabb abab banana aaaa"),
      (1L, "cab bca abcabc"), (2L, ""))
    // out-of-order derivation: rank 1 references a symbol minted later —
    // the chain skips it at step 1 and NEVER revisits; the watermark must
    // reproduce that (naive min-rank-priority BPE would apply it)
    runBoth(corpus, Seq(("ab", "c"), ("a", "b")))
    // duplicate pair whose second occurrence fires after its pair re-forms
    runBoth(corpus, Seq(("ab", "c"), ("a", "b"), ("ab", "c")))
    // exact duplicates back-to-back, self-pairs, overlapping chains
    runBoth(corpus, Seq(("a", "a"), ("a", "a"), ("aa", "aa"), ("b", "b")))
    runBoth(corpus, Seq(("a", "b"), ("b", "a"), ("ab", "ab"), ("ba", "n"),
      ("n", "a"), ("a", "na")))
    // random arbitrary lists over a small alphabet
    val mergeGen: Gen[Seq[(String, String)]] = for {
      n <- Gen.choose(1, 12)
      parts <- Gen.listOfN(n, for {
        a <- Gen.oneOf("a", "b", "c", "ab", "bc", "abc", "aa", "n", "an")
        b <- Gen.oneOf("a", "b", "c", "ab", "bc", "ca", "aa", "na")
      } yield (a, b))
    } yield parts
    (1 to 15).foreach { seed => runBoth(corpus, sample(mergeGen, seed)) }
  }

  test("non-BMP text trains and applies per code point on both paths") {
    // U+1F600 (😀) is a surrogate pair in UTF-16: pre-fix training split
    // it into lone surrogates and its merges could never match at apply
    val emoji = new String(Character.toChars(0x1F600))
    val docs = Seq((0L, s"$emoji$emoji $emoji$emoji $emoji$emoji"),
      (1L, s"a$emoji a$emoji")).toDF("doc_id", "text")
    val freq = Bpe.wordFreq(docs, "text", 10)
    val merges = Bpe.trainMerges(freq, numMerges = 2, minPairCount = 2L)
    // the first merge must be the WHOLE code point paired with itself /
    // the letter — never a lone surrogate
    assert(merges.nonEmpty)
    merges.foreach { case (a, b) =>
      Seq(a, b).foreach { s =>
        assert(!(s.length == 1 && Character.isSurrogate(s.charAt(0))),
          s"merge symbol '$s' is a lone surrogate")
      }
    }
    assert(merges.head === (emoji, emoji))
    runBoth(Seq((0L, s"$emoji$emoji $emoji$emoji"), (1L, s"a$emoji a$emoji")),
      merges)
    // applying (emoji, emoji) halves the symbol count
    val n = docs.filter($"doc_id" === 0L)
      .select(Bpe.bpeTokenCount($"text", Seq((emoji, emoji)))).head.getLong(0)
    assert(n === 3L, "each 2-emoji token must merge to ONE symbol")
    // vocabulary() emits whole code points at ord 0
    Bpe.vocabulary(freq, merges).filter(_._2 == 0).foreach { case (c, _) =>
      assert(!(c.length == 1 && Character.isSurrogate(c.charAt(0))),
        s"vocabulary char '$c' is a lone surrogate")
    }
  }

  test("large merge lists are B-invariant through the public path") {
    val corpus = Seq((0L, "banana bandana cabana"), (1L, "ban can nab"))
    val df = corpus.toDF("doc_id", "text")
    val real = Bpe.train(df, "text", maxWordTypes = 100, numMerges = 10,
      minPairCount = 1L)
    // pad far past any chain-feasible size with merges over a disjoint
    // alphabet — they can never apply, so the segmentation must not change
    val pad = (0 until 5000).map(i => (s"X$i", s"Y$i"))
    val padded = real ++ pad
    val viaChain = df.select($"doc_id",
      array_join(Bpe.segmentTokensChain($"text", real), "|").as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaDispatch = df.select($"doc_id",
      array_join(Bpe.segmentTokens($"text", padded), "|").as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaDispatch === viaChain,
      "padded 5k-merge kernel dispatch must equal the effective chain")
    // and the count surface agrees through the same dispatch
    val n1 = df.select(org.apache.spark.sql.functions.sum(
      Bpe.bpeTokenCount($"text", real))).head.getLong(0)
    val n2 = df.select(org.apache.spark.sql.functions.sum(
      Bpe.bpeTokenCount($"text", padded))).head.getLong(0)
    assert(n1 === n2)
  }
}
