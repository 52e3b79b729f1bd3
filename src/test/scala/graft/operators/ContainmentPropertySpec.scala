package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** ScalaCheck properties for [[Dedup.ngramContamination]] over generated
  * corpora: small vocabulary + planted quotes, checked against an
  * in-memory reference (distinct n-gram sets per side, intersection
  * counts). Covers organic cross-doc gram collisions, quotes at doc
  * boundaries, sub-n docs, and the minHits threshold. */
class ContainmentPropertySpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val vocab = Seq("w1", "w2", "w3", "w4", "w5", "w6")

  // train docs 3..12 tokens from a 6-word vocab; eval docs 2..6 tokens —
  // with n = 3 many eval grams organically appear in train docs, plus one
  // train doc per eval doc QUOTES it verbatim (prepended context)
  private val corpusGen: Gen[(Seq[(Long, String)], Seq[(Long, String)])] = for {
    nTrain <- Gen.choose(5, 25)
    train <- Gen.listOfN(nTrain, for {
      len <- Gen.choose(3, 12)
      ts <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ts.mkString(" "))
    nEval <- Gen.choose(1, 4)
    eval <- Gen.listOfN(nEval, for {
      len <- Gen.choose(2, 6)
      ts <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ts.mkString(" "))
  } yield {
    val trainIdx = train.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val evalIdx = eval.zipWithIndex.map { case (t, i) => (1000L + i, t) }
    // plant verbatim quotes: one extra train doc per eval doc
    val quotes = evalIdx.zipWithIndex.map { case ((eid, t), i) =>
      (500L + i, s"w1 w2 $t w3") }
    (trainIdx ++ quotes, evalIdx)
  }

  private def grams(t: String, n: Int): Set[Seq[String]] = {
    val tk = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toVector
    if (tk.length < n) Set.empty
    else (0 to tk.length - n).map(i => tk.slice(i, i + n)).toSet
  }

  test("ngramContamination == reference intersection counts on random corpora") {
    for (seed <- Seq(5L, 21L, 63L, 200L); minHits <- Seq(1L, 2L)) {
      val (train, eval) = sample(corpusGen, seed)
      val n = 3
      val expect = (for {
        (tid, tt) <- train
        (eid, et) <- eval
        shared = grams(tt, n).intersect(grams(et, n)).size
        if shared >= minHits
      } yield (tid, eid) -> shared.toLong).toMap
      val got = Dedup.ngramContamination(train.toDF("doc_id", "text"),
          eval.toDF("doc_id", "text"), "doc_id", "text", n = n, minHits = minHits)
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got == expect,
        s"seed $seed minHits $minHits diffs: ${(got.toSet diff expect.toSet).take(3)} / ${(expect.toSet diff got.toSet).take(3)}")
      // every planted quote is caught at minHits = 1
      if (minHits == 1L) eval.foreach { case (eid, et) =>
        if (grams(et, n).nonEmpty) {
          val quoter = 500L + (eid - 1000L)
          assert(got.contains((quoter, eid)), s"seed $seed quote $quoter->$eid missed")
        }
      }
    }
  }
}
