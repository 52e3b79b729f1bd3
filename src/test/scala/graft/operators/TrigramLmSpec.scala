package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Order-3 Stupid-Backoff LM ([[LanguageModel.TrigramLM]]) against an
  * independent plain-Scala reference: trigram counts under the fixed
  * vocabulary/caps, the trigram → bigram → unigram backoff chain
  * (including the context-bigram-missing branch), update == retrain
  * when nothing is lossy, batch additivity, and exact persistence. */
class TrigramLmSpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "<unk>")
  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 35)
    docs <- Gen.sequence[Seq[String], String]((0 until n).map { i =>
      for {
        empty <- Gen.frequency(1 -> true, 9 -> false)
        len <- Gen.choose(1, 18)
        toks <- Gen.listOfN(len,
          Gen.frequency(8 -> Gen.oneOf(vocab), 1 -> Gen.const(s"rare$i")))
      } yield if (empty) "" else toks.mkString(" ")
    })
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def tok(t: String): Seq[String] =
    graft.functions.TextHash.WS.split(t.toLowerCase).toSeq.filter(_.nonEmpty)

  // ---- independent reference --------------------------------------------

  private case class RefT(uni: Map[String, Long],
      bi: Map[(String, String), Long],
      tri: Map[(String, String, String), Long], nPrime: Long, unk: Long)

  private def refTrain(corpus: Seq[(Long, String)], vocabCap: Int,
      biMin: Int, triMin: Int): RefT = {
    val toks = corpus.map { case (_, t) => tok(t) }
    val rawCnt = toks.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val total = rawCnt.values.sum
    val vb = rawCnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(vocabCap)
    val vset = vb.map(_._1).toSet
    val unk = total - vb.map(_._2).sum + 1L
    val uni0 = vb.toMap
    val uni = uni0 + (LanguageModel.Unk ->
      (uni0.getOrElse(LanguageModel.Unk, 0L) + unk))
    val m = (w: String) => if (vset(w)) w else LanguageModel.Unk
    val bi = toks.flatMap(ts => ts.zip(ts.drop(1)).map { case (a, b) => (m(a), m(b)) })
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= biMin)
    val tri = toks.flatMap(ts => ts.indices.drop(2).map(i =>
        (m(ts(i - 2)), m(ts(i - 1)), m(ts(i)))))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= triMin)
    RefT(uni, bi, tri, total + 1L, unk)
  }

  private def refScore(lm: RefT, text: String): (Int, Double) = {
    val ts = tok(text)
    val m = (w: String) => if (lm.uni.contains(w)) w else LanguageModel.Unk
    val lp = ts.zipWithIndex.map { case (w, i) =>
      val cuc = lm.uni.getOrElse(w, lm.unk).toDouble
      def bigramChain(alpha: Double): Double = {
        val wp = ts(i - 1)
        lm.bi.get((m(wp), m(w))) match {
          case Some(cb) =>
            math.log(alpha * (cb.toDouble / lm.uni.getOrElse(wp, lm.unk).toDouble))
          case None =>
            math.log(alpha * LanguageModel.Alpha * (cuc / lm.nPrime))
        }
      }
      if (i == 0) math.log(cuc / lm.nPrime)
      else if (i == 1) {
        // position 2: plain bigram chain (no leading α)
        val wp = ts(0)
        lm.bi.get((m(wp), m(w))) match {
          case Some(cb) =>
            math.log(cb.toDouble / lm.uni.getOrElse(wp, lm.unk).toDouble)
          case None => math.log(LanguageModel.Alpha * (cuc / lm.nPrime))
        }
      } else {
        val key = (m(ts(i - 2)), m(ts(i - 1)), m(w))
        (lm.tri.get(key), lm.bi.get((key._1, key._2))) match {
          case (Some(ct), Some(cctx)) => math.log(ct.toDouble / cctx.toDouble)
          case _ => bigramChain(LanguageModel.Alpha)
        }
      }
    }
    (ts.size, lp.foldLeft(0d)(_ + _))
  }

  // ---- properties -------------------------------------------------------

  test("trained trigram table == reference on random corpora") {
    (1 to 12).foreach { seed =>
      val corpus = sample(corpusGen, seed)
      val vocabCap = sample(Gen.choose(2, 9), seed + 1000)
      val triMin = sample(Gen.choose(1, 3), seed + 2000)
      val tlm = LanguageModel.trainTrigram(corpus.toDF("doc_id", "text"),
        "text", vocabCap, bigramMinCount = 1, trigramMinCount = triMin)
      val ref = refTrain(corpus, vocabCap, 1, triMin)
      assert(tlm.base.unigrams.toMap === ref.uni, s"uni seed=$seed")
      assert(tlm.trigrams.map { case (a, b, c, n) => ((a, b, c), n) }.toMap
        === ref.tri, s"tri seed=$seed")
    }
  }

  test("scoreDocsTrigram == reference backoff chain incl. OOV and short docs") {
    (1 to 10).foreach { seed =>
      val corpus = sample(corpusGen, seed)
      val vocabCap = sample(Gen.choose(2, 8), seed + 1000)
      val tlm = LanguageModel.trainTrigram(corpus.toDF("doc_id", "text"),
        "text", vocabCap, bigramMinCount = 1, trigramMinCount = 1)
      val ref = refTrain(corpus, vocabCap, 1, 1)
      val scoreDocs = corpus.filter(_._1 % 2 == 0) ++
        Seq((9001L, "totally novel tokens in here now"), (9002L, ""),
          (9003L, "alpha"), (9004L, "alpha beta"))
      val got = LanguageModel.scoreDocsTrigram(
          scoreDocs.toDF("doc_id", "text"), "doc_id", "text", tlm)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
      scoreDocs.foreach { case (id, text) =>
        val (n, lp) = refScore(ref, text)
        val (gn, glp) = got(id)
        assert(gn === n, s"n_tok id=$id seed=$seed")
        assert(math.abs(glp - lp) < 1e-9,
          s"logprob id=$id seed=$seed got=$glp ref=$lp")
      }
    }
  }

  test("context-bigram-dropped trigrams back off (the caps interplay)") {
    // trigram (a,b,c) survives triMin=1 but its context bigram (a,b)
    // misses biMin=3 → positions with that context must take the α·bigram
    // branch, never divide by a missing denominator
    val corpus = Seq((0L, "a b c"), (1L, "a b c"), (2L, "b c b c b c"))
    val tlm = LanguageModel.trainTrigram(corpus.toDF("doc_id", "text"),
      "text", vocabCap = 10, bigramMinCount = 3, trigramMinCount = 1)
    assert(tlm.trigrams.exists(t => (t._1, t._2, t._3) == ("a", "b", "c")))
    assert(!tlm.base.bigrams.exists(t => (t._1, t._2) == ("a", "b")))
    val ref = refTrain(corpus, 10, 3, 1)
    val got = LanguageModel.scoreDocsTrigram(
        Seq((5L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", tlm)
      .collect().head
    val (n, lp) = refScore(ref, "a b c")
    assert(got.getInt(1) === n)
    assert(math.abs(got.getDouble(2) - lp) < 1e-12)
    assert(!got.getDouble(2).isInfinite && !got.getDouble(2).isNaN)
  }

  test("lmUpdateTrigram == retrain when nothing is lossy; additive") {
    (1 to 6).foreach { seed =>
      val a = sample(corpusGen, seed)
      val baseWords = a.flatMap(_._2.split(' ')).filter(_.nonEmpty).distinct
      val b = sample(corpusGen, seed + 500).map { case (id, _) =>
        val rnd = new java.util.Random(seed * 1000L + id)
        (id + 10000L, Seq.fill(rnd.nextInt(12))(
          baseWords(rnd.nextInt(baseWords.length))).mkString(" "))
      }
      val tA = LanguageModel.trainTrigram(a.toDF("doc_id", "text"), "text",
        vocabCap = 1000, bigramMinCount = 1, trigramMinCount = 1)
      val updated = LanguageModel.lmUpdateTrigram(tA,
        b.toDF("doc_id", "text"), "text")
      val retrained = LanguageModel.trainTrigram(
        (a ++ b).toDF("doc_id", "text"), "text", vocabCap = 1000,
        bigramMinCount = 1, trigramMinCount = 1)
      assert(updated.base.unigrams.toMap === retrained.base.unigrams.toMap)
      assert(updated.base.bigrams.toSet === retrained.base.bigrams.toSet)
      assert(updated.trigrams.toSet === retrained.trigrams.toSet,
        s"tri seed=$seed")
      assert(updated.base.totalTokens === retrained.base.totalTokens)
    }
    // additivity across batch splits
    val a = sample(corpusGen, 77)
    val b1 = Seq((900L, "alpha beta gamma delta"), (901L, "beta beta beta"))
    val b2 = Seq((902L, "gamma alpha zeta"), (903L, "zeta zeta beta alpha"))
    val t0 = LanguageModel.trainTrigram(a.toDF("doc_id", "text"), "text",
      1000, 1, 1)
    val seq2 = LanguageModel.lmUpdateTrigram(
      LanguageModel.lmUpdateTrigram(t0, b1.toDF("doc_id", "text"), "text"),
      b2.toDF("doc_id", "text"), "text")
    val once = LanguageModel.lmUpdateTrigram(t0,
      (b1 ++ b2).toDF("doc_id", "text"), "text")
    assert(seq2.trigrams.toSet === once.trigrams.toSet)
    assert(seq2.base.bigrams.toSet === once.base.bigrams.toSet)
  }

  test("trigram batch cap never drops increments for existing types") {
    val tlm = LanguageModel.trainTrigram(
      Seq((0L, "a b c"), (1L, "a b c"), (2L, "d"), (3L, "e"), (4L, "f"),
        (5L, "g"), (6L, "h"), (7L, "i"))
        .toDF("doc_id", "text"), "text", 100, 1, 1)
    assert(tlm.trigrams.contains(("a", "b", "c", 2L)))
    val batch = Seq((8L, "a b c"), (9L, "d e f d e f d e f"),
      (10L, "g h i g h i g h i")).toDF("doc_id", "text")
    val upd = LanguageModel.lmUpdateTrigram(tlm, batch, "text", trigramCap = 2)
    val triMap = upd.trigrams.map { case (a, b, c, n) => (a, b, c) -> n }.toMap
    assert(triMap.get(("a", "b", "c")) === Some(3L),
      s"existing trigram increment lost: ${upd.trigrams}")
  }

  test("trigram scoring plan is broadcast-only (6 model joins, no SMJ)") {
    val corpus = sample(corpusGen, 21)
    val tlm = LanguageModel.trainTrigram(corpus.toDF("doc_id", "text"),
      "text", vocabCap = 6, bigramMinCount = 1, trigramMinCount = 1)
    // parquet-backed input: a literal frame folds to LocalTableScan at
    // optimization time and hides the join strategy under test
    val dir = java.nio.file.Files.createTempDirectory("graft-triplan").toString
    corpus.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val plan = LanguageModel.scoreDocsTrigram(
        spark.read.parquet(dir), "doc_id", "text", tlm)
      .queryExecution.executedPlan.toString
    val nBhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(nBhj >= 6 && !plan.contains("SortMergeJoin"),
      s"trigram scoring not broadcast-only: bhj=$nBhj " +
        s"smj=${plan.contains("SortMergeJoin")}\n$plan")
  }

  test("lmSaveTrigram/lmLoadTrigram round-trips exactly; loaded scores identically") {
    val corpus = sample(corpusGen, 9)
    val tlm = LanguageModel.trainTrigram(corpus.toDF("doc_id", "text"),
      "text", vocabCap = 6, bigramMinCount = 1, trigramMinCount = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-trilm").toString
    LanguageModel.lmSaveTrigram(spark, dir, tlm)
    val loaded = LanguageModel.lmLoadTrigram(spark, dir)
    assert(loaded === tlm)
    val df = corpus.take(5).toDF("doc_id", "text")
    val a = LanguageModel.scoreDocsTrigram(df, "doc_id", "text", tlm)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = LanguageModel.scoreDocsTrigram(df, "doc_id", "text", loaded)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a === b)
  }
}
