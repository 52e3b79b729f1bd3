package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Generic order-N LM ([[NgramLm]]) pinned three ways: order 2 must
  * equal [[LanguageModel.trainBigram]]/`scoreDocs` model-for-model and
  * score-for-score, order 3 must equal the concrete trigram path, and
  * order 5 must equal an independent plain-Scala generic backoff
  * reference (including OOV, short docs, and positions whose available
  * context is shorter than the model order). */
class NgramLmSpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "<unk>")
  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 30)
    docs <- Gen.sequence[Seq[String], String]((0 until n).map { i =>
      for {
        empty <- Gen.frequency(1 -> true, 9 -> false)
        len <- Gen.choose(1, 16)
        toks <- Gen.listOfN(len,
          Gen.frequency(8 -> Gen.oneOf(vocab), 1 -> Gen.const(s"rare$i")))
      } yield if (empty) "" else toks.mkString(" ")
    })
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def tok(t: String): Seq[String] =
    graft.functions.TextHash.WS.split(t.toLowerCase).toSeq.filter(_.nonEmpty)

  private def scoresOf(df: org.apache.spark.sql.DataFrame): Map[Long, (Int, Double)] =
    df.collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap

  test("order 2 == the concrete bigram path, model and scores") {
    (1 to 6).foreach { seed =>
      val corpus = sample(corpusGen, seed)
      val df = corpus.toDF("doc_id", "text")
      val vocabCap = sample(Gen.choose(2, 8), seed + 100)
      val g = NgramLm.train(df, "text", order = 2, vocabCap, minCount = 1)
      val b = LanguageModel.trainBigram(df, "text", vocabCap, 1)
      assert(g.unigrams === b.unigrams)
      assert(g.tables(0).map { case (ws, c) => (ws(0), ws(1), c) }.toSet ===
        b.bigrams.toSet)
      assert(g.totalTokens === b.totalTokens && g.unkCount === b.unkCount)
      val gs = scoresOf(NgramLm.scoreDocs(df, "doc_id", "text", g))
      val bs = scoresOf(LanguageModel.scoreDocs(df, "doc_id", "text", b))
      assert(gs === bs, s"seed=$seed")
    }
  }

  test("order 3 == the concrete trigram path, model and scores") {
    (1 to 6).foreach { seed =>
      val corpus = sample(corpusGen, seed + 40)
      val df = corpus.toDF("doc_id", "text")
      val vocabCap = sample(Gen.choose(2, 8), seed + 140)
      val g = NgramLm.train(df, "text", order = 3, vocabCap, minCount = 1)
      val t = LanguageModel.trainTrigram(df, "text", vocabCap,
        bigramMinCount = 1, trigramMinCount = 1)
      assert(g.tables(1).map { case (ws, c) => (ws(0), ws(1), ws(2), c) }.toSet
        === t.trigrams.toSet)
      val gs = scoresOf(NgramLm.scoreDocs(df, "doc_id", "text", g))
      val ts = scoresOf(LanguageModel.scoreDocsTrigram(df, "doc_id", "text", t))
      assert(gs === ts, s"seed=$seed")
    }
  }

  // ---- independent generic reference ------------------------------------

  private def refScore(m: NgramLm.NgramModel, text: String): (Int, Double) = {
    val uniM = m.unigrams.toMap
    val grams: Map[Int, Map[Vector[String], Long]] =
      (2 to m.order).map(n =>
        n -> m.tables(n - 2).map { case (ws, c) => ws -> c }.toMap).toMap
    val ts = tok(text)
    val mp = (w: String) => if (uniM.contains(w)) w else LanguageModel.Unk
    def alphaPow(p: Int): Double =
      (1 to p).map(_ => LanguageModel.Alpha).foldLeft(Option.empty[Double]) {
        case (None, a) => Some(a)
        case (Some(x), a) => Some(x * a)
      }.getOrElse(1d)
    val lp = ts.zipWithIndex.map { case (w, i) =>
      val cuc = uniM.getOrElse(w, m.unkCount).toDouble
      val k = math.min(i, m.order - 1) // available context words
      if (k == 0) math.log(cuc / m.totalTokens)
      else {
        val maxN = k + 1
        val hit = (maxN to 2 by -1).view.flatMap { j =>
          val gram = (i - j + 1 to i).map(x => mp(ts(x))).toVector
          val ctx = gram.dropRight(1)
          val denOk = j < 3 || grams(j - 1).contains(ctx)
          grams(j).get(gram) match {
            case Some(c) if denOk =>
              val den = if (j >= 3) grams(j - 1)(ctx).toDouble
                else uniM.getOrElse(ts(i - 1), m.unkCount).toDouble
              Some(math.log(alphaPow(maxN - j) * (c.toDouble / den)))
            case _ => None
          }
        }.headOption
        hit.getOrElse(math.log(alphaPow(maxN - 1) * (cuc / m.totalTokens)))
      }
    }
    (ts.size, lp.foldLeft(0d)(_ + _))
  }

  test("order 5 scoring == generic reference incl. OOV and short docs") {
    (1 to 6).foreach { seed =>
      val corpus = sample(corpusGen, seed + 80)
      val df = corpus.toDF("doc_id", "text")
      val m = NgramLm.train(df, "text", order = 5,
        vocabCap = sample(Gen.choose(3, 8), seed + 180), minCount = 1)
      val scoreDocs = corpus.filter(_._1 % 2 == 0) ++
        Seq((9001L, "totally novel tokens right here in this doc"),
          (9002L, ""), (9003L, "alpha"), (9004L, "alpha beta gamma"))
      val got = scoresOf(NgramLm.scoreDocs(
        scoreDocs.toDF("doc_id", "text"), "doc_id", "text", m))
      scoreDocs.foreach { case (id, text) =>
        val (n, lp) = refScore(m, text)
        val (gn, glp) = got(id)
        assert(gn === n, s"n_tok id=$id seed=$seed")
        assert(math.abs(glp - lp) < 1e-9,
          s"logprob id=$id seed=$seed got=$glp ref=$lp")
      }
    }
  }

  test("update == retrain when nothing is lossy; existing types cap-exempt") {
    (1 to 4).foreach { seed =>
      val a = sample(corpusGen, seed + 200)
      val baseWords = a.flatMap(_._2.split(' ')).filter(_.nonEmpty).distinct
      val b = sample(corpusGen, seed + 700).map { case (id, _) =>
        val rnd = new java.util.Random(seed * 1000L + id)
        (id + 10000L, Seq.fill(rnd.nextInt(12))(
          baseWords(rnd.nextInt(baseWords.length))).mkString(" "))
      }
      val m0 = NgramLm.train(a.toDF("doc_id", "text"), "text", order = 4,
        vocabCap = 1000, minCount = 1)
      val updated = NgramLm.update(m0, b.toDF("doc_id", "text"), "text")
      val retrained = NgramLm.train((a ++ b).toDF("doc_id", "text"), "text",
        order = 4, vocabCap = 1000, minCount = 1)
      assert(updated.unigrams.toMap === retrained.unigrams.toMap, s"uni seed=$seed")
      (2 to 4).foreach { n =>
        assert(updated.tables(n - 2).toMap === retrained.tables(n - 2).toMap,
          s"$n-gram table seed=$seed")
      }
      assert(updated.totalTokens === retrained.totalTokens)
      assert(updated.unkCount === retrained.unkCount)
    }
    // existing-type increments survive a binding cap (the lmUpdate rule,
    // per table): model knows (a,b,c,d); batch increments it once and
    // floods two new 4-gram types with higher counts
    val m = NgramLm.train(
      Seq((0L, "a b c d"), (1L, "a b c d"), (2L, "e"), (3L, "f"), (4L, "g"),
        (5L, "h"), (6L, "i"), (7L, "j"), (8L, "k"), (9L, "l"))
        .toDF("doc_id", "text"), "text", order = 4, vocabCap = 100)
    val batch = Seq((10L, "a b c d"), (11L, "e f g h e f g h e f g h"),
      (12L, "i j k l i j k l i j k l")).toDF("doc_id", "text")
    val upd = NgramLm.update(m, batch, "text", tableCap = 2)
    val t4 = upd.tables(2).toMap
    assert(t4.get(Vector("a", "b", "c", "d")) === Some(3L),
      s"existing 4-gram increment lost: $t4")
  }

  test("save/load round-trips exactly; loaded model scores identically") {
    val corpus = sample(corpusGen, 11)
    val m = NgramLm.train(corpus.toDF("doc_id", "text"), "text", order = 5,
      vocabCap = 6, minCount = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-ngram").toString
    NgramLm.save(spark, dir, m)
    val loaded = NgramLm.load(spark, dir)
    assert(loaded.order === m.order && loaded.unigrams === m.unigrams &&
      loaded.totalTokens === m.totalTokens && loaded.unkCount === m.unkCount)
    (2 to 5).foreach(n =>
      assert(loaded.tables(n - 2).toMap === m.tables(n - 2).toMap, s"n=$n"))
    val df = corpus.take(5).toDF("doc_id", "text")
    val a = scoresOf(NgramLm.scoreDocs(df, "doc_id", "text", m))
    val b = scoresOf(NgramLm.scoreDocs(df, "doc_id", "text", loaded))
    assert(a === b)
  }

  test("bad orders and reserved columns fail loudly") {
    val df = Seq((0L, "alpha beta")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](NgramLm.train(df, "text", 1, 5))
    intercept[IllegalArgumentException](NgramLm.train(df, "text", 7, 5))
    val m = NgramLm.train(df, "text", 4, 5)
    val e = intercept[IllegalArgumentException] {
      NgramLm.scoreDocs(Seq((1L, "x", "alpha")).toDF("Wp2", "mc", "text"),
        "Wp2", "text", m, passthrough = Seq("mc"))
    }
    assert(e.getMessage.contains("Wp2") && e.getMessage.contains("mc"))
  }
}
