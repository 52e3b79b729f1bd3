package graft.operators

import graft.SparkTestBase

/** Random sweep pinning the output EQUALITY of the two exact-Jaccard
  * physical plans ([[Dedup.jaccardPairs]] inverted index vs the
  * AllPairs/PPJoin prefix filter) on adversarial shapes: tiny vocabulary
  * (hot shingles, round-boundary Jaccard values), thresholds at repeating
  * decimals, and an active df cap. The prefix plan's pruning bounds must
  * use exactly the same slacked threshold as the inverted plan's length
  * filter or the two diverge on round-up pairs — this sweep is the
  * regression net for that invariant. */
class JaccardParityPropertySpec extends SparkTestBase {

  import spark.implicits._

  test("prefix plan == inverted plan on random corpora, thresholds and caps") {
    val rnd = new scala.util.Random(77L)
    val vocab = Seq("a1", "a2", "a3", "a4", "a5")
    for (trial <- 1 to 3; (threshold, cap) <- Seq(
        (0.5, Long.MaxValue), (1d / 3d, Long.MaxValue), (0.6, 8L))) {
      val docs = (0 until (30 + rnd.nextInt(60))).map { i =>
        val len = 3 + rnd.nextInt(9)
        (i.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val inverted = Dedup.jaccardPairs(df, "doc_id", "text", n = 2,
          threshold = threshold, maxShingleDf = cap)
        .as[(Long, Long, Double)].collect().toSet
      val prefixed = Dedup.jaccardPairs(df, "doc_id", "text", n = 2,
          threshold = threshold, maxShingleDf = cap, prefixFilter = true)
        .as[(Long, Long, Double)].collect().toSet
      assert(prefixed == inverted,
        s"trial $trial t=$threshold cap=$cap: " +
          s"prefixOnly=${(prefixed diff inverted).take(3)} invOnly=${(inverted diff prefixed).take(3)}")
      assert(inverted.nonEmpty || docs.size < 10, // tiny vocab ⇒ pairs exist
        s"trial $trial t=$threshold produced no pairs at all")
    }
  }
}
