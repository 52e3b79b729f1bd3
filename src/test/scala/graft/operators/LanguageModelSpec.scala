package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** ScalaCheck properties for the bigram Stupid-Backoff LM
  * ([[LanguageModel]]) against an independent plain-Scala reference with
  * the same tokenizer semantics. Exercises what the oracle corpus cannot:
  * empty docs, single-token docs, vocabCap larger than the vocabulary
  * (nothing OOV at train time — the add-one unk row must still score
  * novel tokens finitely), OOV-heavy scoring docs, bigramCap boundary
  * ties, and literal `<unk>` corpus tokens merging with the sink. */
class LanguageModelSpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "<unk>")
  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 40)
    docs <- Gen.sequence[Seq[String], String]((0 until n).map { i =>
      for {
        empty <- Gen.frequency(1 -> true, 9 -> false)
        len <- Gen.choose(1, 20)
        toks <- Gen.listOfN(len,
          Gen.frequency(8 -> Gen.oneOf(vocab), 1 -> Gen.const(s"rare$i")))
      } yield if (empty) "" else toks.mkString(" ")
    })
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  // ---- independent reference --------------------------------------------

  private def tok(t: String): Seq[String] =
    graft.functions.TextHash.WS.split(t.toLowerCase).toSeq.filter(_.nonEmpty)

  private case class RefLM(uni: Map[String, Long], bi: Map[(String, String), Long],
      nPrime: Long, unk: Long)

  private def refTrain(corpus: Seq[(Long, String)], vocabCap: Int,
      minCount: Int, bigramCap: Int): RefLM = {
    val toks = corpus.map { case (_, t) => tok(t) }
    val rawCnt = toks.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val total = rawCnt.values.sum
    val vb = rawCnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(vocabCap)
    val vset = vb.map(_._1).toSet
    val unk = total - vb.map(_._2).sum + 1L
    val uni0 = vb.toMap
    val uni = uni0 + (LanguageModel.Unk -> (uni0.getOrElse(LanguageModel.Unk, 0L) + unk))
    val m = (w: String) => if (vset(w)) w else LanguageModel.Unk
    val biAll = toks.flatMap(ts => ts.zip(ts.drop(1)).map { case (a, b) => (m(a), m(b)) })
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= minCount)
    val bi = biAll.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.take(bigramCap).toMap
    RefLM(uni, bi, total + 1L, unk)
  }

  private def refScore(lm: RefLM, text: String): (Int, Double) = {
    val ts = tok(text)
    val lp = ts.zipWithIndex.map { case (w, i) =>
      val cuc = lm.uni.getOrElse(w, lm.unk).toDouble
      if (i == 0) math.log(cuc / lm.nPrime)
      else {
        val wp = ts(i - 1)
        val mpm = if (lm.uni.contains(wp)) wp else LanguageModel.Unk
        val mcm = if (lm.uni.contains(w)) w else LanguageModel.Unk
        lm.bi.get((mpm, mcm)) match {
          case Some(cb) =>
            val cup = lm.uni.getOrElse(wp, lm.unk).toDouble
            math.log(cb.toDouble / cup)
          case None => math.log(LanguageModel.Alpha * (cuc / lm.nPrime))
        }
      }
    }
    (ts.size, lp.foldLeft(0d)(_ + _))
  }

  // ---- properties -------------------------------------------------------

  test("trained model == plain-Scala reference on 25 random corpora") {
    (1 to 25).foreach { seed =>
      val corpus = sample(corpusGen, seed)
      val vocabCap = sample(Gen.choose(1, 10), seed + 1000)
      val minCount = sample(Gen.choose(1, 3), seed + 2000)
      val df = corpus.toDF("doc_id", "text")
      val lm = LanguageModel.trainBigram(df, "text", vocabCap, minCount)
      val ref = refTrain(corpus, vocabCap, minCount, bigramCap = 1000000)
      assert(lm.unigrams.toMap === ref.uni, s"unigrams seed=$seed")
      assert(lm.bigrams.map { case (a, b, c) => ((a, b), c) }.toMap === ref.bi,
        s"bigrams seed=$seed")
      assert(lm.totalTokens === ref.nPrime, s"nPrime seed=$seed")
      assert(lm.unkCount === ref.unk, s"unk seed=$seed")
    }
  }

  test("scoreDocs == reference fold (exact arithmetic) incl. OOV docs") {
    (1 to 15).foreach { seed =>
      val corpus = sample(corpusGen, seed)
      val vocabCap = sample(Gen.choose(1, 8), seed + 1000)
      val df = corpus.toDF("doc_id", "text")
      val lm = LanguageModel.trainBigram(df, "text", vocabCap, 1)
      val ref = refTrain(corpus, vocabCap, 1, 1000000)
      // score a shifted corpus: half the docs + novel-token docs
      val scoreDocs = corpus.filter(_._1 % 2 == 0) ++
        Seq((9001L, "totally novel tokens here"), (9002L, ""), (9003L, "alpha"))
      val got = LanguageModel.scoreDocs(
          scoreDocs.toDF("doc_id", "text"), "doc_id", "text", lm)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
      scoreDocs.foreach { case (id, text) =>
        val (n, lp) = refScore(ref, text)
        val (gn, glp) = got(id)
        assert(gn === n, s"n_tok id=$id seed=$seed")
        assert(math.abs(glp - lp) < 1e-9, s"logprob id=$id seed=$seed got=$glp ref=$lp")
      }
    }
  }

  test("no-OOV training still scores novel tokens finitely (add-one unk)") {
    val corpus = Seq((0L, "alpha beta alpha"), (1L, "beta gamma"))
    val lm = LanguageModel.trainBigram(corpus.toDF("doc_id", "text"), "text",
      vocabCap = 100, bigramMinCount = 1)
    assert(lm.unkCount === 1L)
    assert(lm.totalTokens === 6L) // 5 tokens + 1
    val r = LanguageModel.scoreDocs(
        Seq((7L, "zzz alpha zzz")).toDF("doc_id", "text"), "doc_id", "text", lm)
      .collect().head
    assert(r.getInt(1) === 3)
    assert(!r.getDouble(2).isInfinite && !r.getDouble(2).isNaN)
  }

  test("bigramCap keeps the top types with a total tie order") {
    val corpus = Seq((0L, "a b a b a c a c b c"))
    val lm = LanguageModel.trainBigram(corpus.toDF("doc_id", "text"), "text",
      vocabCap = 10, bigramMinCount = 1, bigramCap = 3)
    val ref = refTrain(corpus, 10, 1, 3)
    assert(lm.bigrams.map { case (a, b, c) => ((a, b), c) }.toMap === ref.bi)
    assert(lm.bigrams.size === 3)
  }

  test("lmUpdate == retrain when nothing is lossy (full vocab, minCount 1)") {
    (1 to 8).foreach { seed =>
      val a = sample(corpusGen, seed)
      // batch draws only words the base corpus already contains, so the
      // fixed vocabulary covers it; vocabCap covers everything; minCount
      // 1 removes the only lossy rule — update must equal retrain exactly
      val baseWords = a.flatMap(_._2.split(' ')).filter(_.nonEmpty).distinct
      val b = sample(corpusGen, seed + 500).map { case (id, _) =>
        val rnd = new java.util.Random(seed * 1000L + id)
        (id + 10000L, Seq.fill(rnd.nextInt(10))(
          baseWords(rnd.nextInt(baseWords.length))).mkString(" "))
      }
      val lmA = LanguageModel.trainBigram(a.toDF("doc_id", "text"), "text",
        vocabCap = 1000, bigramMinCount = 1)
      val updated = LanguageModel.lmUpdate(lmA, b.toDF("doc_id", "text"), "text")
      val retrained = LanguageModel.trainBigram(
        (a ++ b).toDF("doc_id", "text"), "text", vocabCap = 1000,
        bigramMinCount = 1)
      assert(updated.unigrams.toMap === retrained.unigrams.toMap, s"uni seed=$seed")
      assert(updated.bigrams.toSet === retrained.bigrams.toSet, s"bi seed=$seed")
      assert(updated.totalTokens === retrained.totalTokens, s"N seed=$seed")
      assert(updated.unkCount === retrained.unkCount, s"unk seed=$seed")
    }
  }

  test("lmUpdate is additive across batches (minCount 1)") {
    val a = sample(corpusGen, 31)
    val b1 = Seq((900L, "alpha beta gamma"), (901L, "beta beta"))
    val b2 = Seq((902L, "gamma alpha"), (903L, "zeta zeta beta"))
    val lm = LanguageModel.trainBigram(a.toDF("doc_id", "text"), "text", 1000, 1)
    val seq = LanguageModel.lmUpdate(
      LanguageModel.lmUpdate(lm, b1.toDF("doc_id", "text"), "text"),
      b2.toDF("doc_id", "text"), "text")
    val once = LanguageModel.lmUpdate(lm, (b1 ++ b2).toDF("doc_id", "text"), "text")
    assert(seq.unigrams.toMap === once.unigrams.toMap)
    assert(seq.bigrams.toSet === once.bigrams.toSet)
    assert(seq.totalTokens === once.totalTokens && seq.unkCount === once.unkCount)
  }

  test("empty-batch lmUpdate is the identity") {
    val lm = LanguageModel.trainBigram(
      Seq((0L, "alpha beta alpha")).toDF("doc_id", "text"), "text", 100, 1)
    val upd = LanguageModel.lmUpdate(lm,
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text")
    assert(upd === lm)
  }

  test("lmUpdate's documented lossy rule: dropped train counts don't resurrect") {
    // bigram (a,b) occurs once at train (dropped at minCount 2) and once
    // in the batch (below minCount alone) → absent after update, but a
    // full retrain over the union keeps it at count 2
    val a = Seq((0L, "a b"), (1L, "c c c c"))
    val b = Seq((2L, "a b"))
    val lm = LanguageModel.trainBigram(a.toDF("doc_id", "text"), "text", 100, 2)
    val updated = LanguageModel.lmUpdate(lm, b.toDF("doc_id", "text"), "text")
    assert(!updated.bigrams.exists(t => t._1 == "a" && t._2 == "b"))
    val retrained = LanguageModel.trainBigram(
      (a ++ b).toDF("doc_id", "text"), "text", 100, 2)
    assert(retrained.bigrams.exists(t => t._1 == "a" && t._2 == "b"))
    // but a batch reaching minCount alone DOES enter
    val b2 = Seq((3L, "a b"), (4L, "a b"))
    val up2 = LanguageModel.lmUpdate(lm, b2.toDF("doc_id", "text"), "text")
    assert(up2.bigrams.exists(t => t._1 == "a" && t._2 == "b"))
  }

  test("batch cap never drops increments for EXISTING model bigram types") {
    // model: (a,b) count 2. Batch: one more "a b", plus two NEW bigram
    // types with higher counts than the (a,b) increment. With
    // bigramCap = 2 the r9 batch-side limit ranked (a,b)'s increment
    // below the cap and silently lost it (merged counts became
    // batch-order-dependent); now existing-type increments are fetched
    // via the model's own key set and always survive — only NEW types
    // compete for the cap.
    // single-token docs put c..f in the VOCAB without training bigrams
    val lm = LanguageModel.trainBigram(
      Seq((0L, "a b"), (1L, "a b"), (2L, "c"), (3L, "d"), (4L, "e"),
        (5L, "f")).toDF("doc_id", "text"), "text", 100, 1)
    assert(lm.bigrams.contains(("a", "b", 2L)))
    val batch = Seq((6L, "a b"), (7L, "c d c d c d"), (8L, "e f e f e f"))
      .toDF("doc_id", "text")
    val upd = LanguageModel.lmUpdate(lm, batch, "text", bigramCap = 2)
    val biMap = upd.bigrams.map { case (x, y, c) => (x, y) -> c }.toMap
    assert(biMap.get(("a", "b")) === Some(3L),
      s"existing-type increment lost under the cap: ${upd.bigrams}")
    // the merged table still respects the cap's total order for the rest
    assert(upd.bigrams.size <= 2)
  }

  test("lmSave/lmLoad round-trips exactly; loaded model scores identically") {
    val corpus = sample(corpusGen, 7)
    val df = corpus.toDF("doc_id", "text")
    val lm = LanguageModel.trainBigram(df, "text", vocabCap = 6, bigramMinCount = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    LanguageModel.lmSave(spark, dir, lm)
    val lm2 = LanguageModel.lmLoad(spark, dir)
    // every field is integral or a token string — the round-trip is exact
    assert(lm2 === lm)
    val a = LanguageModel.scoreDocs(df, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = LanguageModel.scoreDocs(df, "doc_id", "text", lm2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a === b)
  }

  test("scoring is stateless per row: micro-batch == whole-corpus slice") {
    // the property that makes the op safe as a streaming quality gate:
    // a document's score depends only on the (persisted) model, never on
    // which rows share its batch
    val corpus = sample(corpusGen, 21)
    val df = corpus.toDF("doc_id", "text")
    val lm = LanguageModel.trainBigram(df, "text", vocabCap = 5, bigramMinCount = 1)
    val whole = LanguageModel.scoreDocs(df, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    corpus.grouped(7).zipWithIndex.foreach { case (batch, i) =>
      val got = LanguageModel.scoreDocs(
          batch.toDF("doc_id", "text"), "doc_id", "text", lm)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
      batch.foreach { case (id, _) =>
        assert(got(id) === whole(id), s"batch $i doc $id diverged")
      }
    }
  }

  test("reserved-column clash check is case-insensitive (Spark resolution is)") {
    val lm = LanguageModel.trainBigram(
      Seq((0L, "alpha beta")).toDF("doc_id", "text"), "text", 5, 1)
    val docs = Seq((1L, "x", "alpha beta")).toDF("Pos", "Arr", "text")
    val e = intercept[IllegalArgumentException] {
      LanguageModel.scoreDocs(docs, "Pos", "text", lm,
        passthrough = Seq("Arr"))
    }
    assert(e.getMessage.contains("Pos") && e.getMessage.contains("Arr"))
    val nb = QualityClassifier.trainNb(
      Seq((0L, "alpha")).toDF("doc_id", "text"),
      Seq((0L, "zeta")).toDF("doc_id", "text"), "text", 5)
    val e2 = intercept[IllegalArgumentException] {
      QualityClassifier.scoreDocs(
        Seq((1L, "alpha")).toDF("W", "text"), "W", "text", nb)
    }
    assert(e2.getMessage.contains("rename W"))
  }

  test("perplexityKeep is the exact rank cut with id tie-break") {
    val corpus = sample(corpusGen, 99)
    val df = corpus.toDF("doc_id", "text")
    val lm = LanguageModel.trainBigram(df, "text", 6, 1)
    val scored = LanguageModel.scoreDocs(df, "doc_id", "text", lm)
    val kept = LanguageModel.perplexityKeep(scored, "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = scored.collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
      .sortBy { case (id, a) => (-a, id) }
    val expect = all.take(math.ceil(0.5 * all.length).toInt).map(_._1).toSet
    assert(kept === expect)
    assert(kept.size === math.ceil(0.5 * corpus.size).toInt)
  }
}
