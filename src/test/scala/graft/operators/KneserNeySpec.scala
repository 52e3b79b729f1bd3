package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Interpolated Kneser–Ney scoring ([[LanguageModel.scoreDocsKN]]):
  * exact normalization (Σ_w P_KN(w|v) = 1 for every in-table context —
  * the property that distinguishes real KN from Stupid Backoff, whose
  * backoff mass is deliberately unnormalized), agreement with a
  * first-principles driver-side reference, order sensitivity (KN ranks
  * in-domain bigram order above shuffled order), and the loud clash
  * guard. */
class KneserNeySpec extends SparkTestBase {

  import spark.implicits._

  private val corpus = Seq(
    "the cat sat on the mat",
    "the cat ate the fish",
    "the dog sat on the rug",
    "a dog ate a bone",
    "the fish swam in the sea",
    "a cat and a dog sat")

  private def train(vocabCap: Int = 12, minCount: Int = 1) =
    LanguageModel.trainBigram(
      corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"),
      "text", vocabCap = vocabCap, bigramMinCount = minCount)

  /** Driver-side KN twin (the formula, from first principles). */
  private def knRef(lm: LanguageModel.BigramLM, d: Double,
      mp: Option[String], mc: String): Double = {
    val prec = lm.bigrams.groupBy(_._2).map { case (w, rs) => w -> rs.size }
    val ctxC = lm.bigrams.groupBy(_._1).map { case (v, rs) => v -> rs.map(_._3).sum }
    val ctxN = lm.bigrams.groupBy(_._1).map { case (v, rs) => v -> rs.size }
    val bv = (lm.bigrams.size + lm.unigrams.size).toDouble
    def pc(w: String) = (prec.getOrElse(w, 0) + 1).toDouble / bv
    mp match {
      case Some(v) if ctxC.contains(v) =>
        val cbi = ctxC(v).toDouble
        val cb = lm.bigrams.find(t => t._1 == v && t._2 == mc)
          .map(_._3).getOrElse(0L).toDouble
        math.log(math.max(cb - d, 0d) / cbi + d * ctxN(v) / cbi * pc(mc))
      case _ => math.log(pc(mc))
    }
  }

  test("Σ_w P_KN(w|v) = 1 exactly for every in-table context") {
    val lm = train()
    val prec = lm.bigrams.groupBy(_._2).map { case (w, rs) => w -> rs.size }
    val ctxC = lm.bigrams.groupBy(_._1).map { case (v, rs) => v -> rs.map(_._3).sum }
    val ctxN = lm.bigrams.groupBy(_._1).map { case (v, rs) => v -> rs.size }
    val bv = (lm.bigrams.size + lm.unigrams.size).toDouble
    val d = LanguageModel.KnDiscount
    // continuation alone sums to 1: Σ(prec+1) = B + V
    val pcSum = lm.unigrams.map { case (w, _) =>
      (prec.getOrElse(w, 0) + 1).toDouble / bv }.sum
    assert(math.abs(pcSum - 1d) < 1e-12, s"Σ P_cont = $pcSum")
    ctxC.keys.foreach { v =>
      val s = lm.unigrams.map { case (w, _) =>
        val cb = lm.bigrams.find(t => t._1 == v && t._2 == w)
          .map(_._3).getOrElse(0L).toDouble
        math.max(cb - d, 0d) / ctxC(v) +
          d * ctxN(v) / ctxC(v) * ((prec.getOrElse(w, 0) + 1) / bv)
      }.sum
      assert(math.abs(s - 1d) < 1e-12, s"context '$v': Σ P_KN = $s")
    }
  }

  test("scoreDocsKN == driver-side reference per document") {
    val lm = train()
    val docs = (corpus :+ "the zebra jumped" :+ "").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = LanguageModel.scoreDocsKN(docs, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(3)))).toMap
    val vocab = lm.unigrams.map(_._1).toSet
    (corpus :+ "the zebra jumped" :+ "").zipWithIndex.foreach { case (t, i) =>
      val tk = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .map(w => if (vocab.contains(w)) w else LanguageModel.Unk)
      val lps = tk.indices.map { j =>
        knRef(lm, LanguageModel.KnDiscount,
          if (j == 0) None else Some(tk(j - 1)), tk(j))
      }
      val expAvg = if (tk.isEmpty) 0d else lps.sum / tk.length
      val (n, avg) = got(i.toLong)
      assert(n === tk.length, s"doc $i n_tok")
      assert(math.abs(avg - expAvg) < 1e-9,
        s"doc $i: engine $avg vs reference $expAvg")
    }
  }

  test("KN prefers in-domain word order over shuffled order") {
    val lm = train()
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "mat the on sat cat the")).toDF("doc_id", "text")
    val scores = LanguageModel.scoreDocsKN(docs, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scores(0L) > scores(1L),
      s"in-order ${scores(0L)} should beat shuffled ${scores(1L)}")
  }

  test("reserved-column clash fails loudly (case-insensitive)") {
    val lm = train()
    val docs = Seq((1L, "the cat", "x")).toDF("doc_id", "text", "Precc")
    val e = intercept[IllegalArgumentException] {
      LanguageModel.scoreDocsKN(docs, "doc_id", "text", lm,
        passthrough = Seq("Precc"))
    }
    assert(e.getMessage.contains("reserves"))
    val e2 = intercept[IllegalArgumentException] {
      LanguageModel.scoreDocsKN(docs, "doc_id", "text", lm, discount = 1.5)
    }
    assert(e2.getMessage.contains("discount"))
  }
}
