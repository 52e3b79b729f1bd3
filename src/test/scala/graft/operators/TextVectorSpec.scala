package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.{DsirFeatures, TextHash}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-TF cosine search: kernel/reference parity, exact-integer
  * accounting, ranking semantics. */
class TextVectorSpec extends SparkTestBase {

  import spark.implicits._

  private val Dim = 128

  private def refCounts(text: String): Array[Int] = {
    val t = TextHash.WS.split(text.toLowerCase).filter(_.nonEmpty).toSeq
    val grams = t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    val out = new Array[Int](Dim)
    grams.foreach(g => out((TextHash.poly(g, DsirFeatures.GramMult) % Dim).toInt) += 1)
    out
  }

  test("bucketCountsDense == independent reference, counts not distinct") {
    Seq("the cat sat on the mat", "a a a", "", "x").foreach { t =>
      val got = DsirFeatures.bucketCountsDense(UTF8String.fromString(t), Dim)
      assert(got.toSeq == refCounts(t).toSeq, s"counts differ for '$t'")
    }
  }

  /** The kernel's EXACT formula over reference counts — integer sums,
    * then `dot/(√a²·√q²)`. Note a self-match is `s/(√s·√s)`, which is
    * NOT exactly 1.0 in IEEE (√s·√s rounds) — the kernel matches this
    * formula bit-for-bit, which is the cross-engine contract; cosmetic
    * 1.0 is not. */
  private def refCos(doc: String, query: String): Double = {
    val cd = refCounts(doc); val cq = refCounts(query)
    val dot = cd.zip(cq).map { case (x, y) => x.toLong * y }.sum
    val a2 = cd.map(v => v.toLong * v).sum
    val q2 = cq.map(v => v.toLong * v).sum
    if (a2 == 0L || q2 == 0L) 0.0
    else dot.toDouble / (math.sqrt(a2.toDouble) * math.sqrt(q2.toDouble))
  }

  test("hashedCosine == the exact integer-sum formula, bit-for-bit") {
    val q = "alpha beta gamma"
    val qa = refCounts(q)
    val qn = qa.map(v => v.toLong * v).sum
    Seq(q, "alpha beta delta", "omega psi", "", "alpha alpha beta beta gamma")
      .foreach { d =>
        assert(DsirFeatures.hashedCosine(UTF8String.fromString(d), qa, qn) ==
          refCos(d, q), s"kernel drifted for '$d'")
      }
    // a self-match is the maximum over any corpus (≈1 up to the √ round)
    assert(math.abs(refCos(q, q) - 1.0) < 1e-12)
  }

  test("cosineTopK: ranking by reference cosine, ties by id, k bound") {
    val texts = Map(
      1L -> "alpha beta gamma",     // identical to the query
      2L -> "alpha beta gamma",     // identical too → tie, id orders
      3L -> "alpha beta other",     // partial overlap
      4L -> "unrelated words here", // low/zero overlap (hash collisions allowed)
      5L -> "")                     // zero grams → always dropped
    val docs = texts.toSeq.toDF("doc_id", "text")
    val q = "alpha beta gamma"
    val want = texts.toSeq
      .map { case (id, t) => (id, refCos(t, q)) }
      .filter(_._2 > 0)
      .sortBy { case (id, c) => (-c, id) }
    val got = TextVector.cosineTopK(docs, "doc_id", "text", q, Dim, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, s"ranking differs: got=$got want=$want")
    assert(got.take(2).map(_._1) == Seq(1L, 2L)) // exact matches lead, id tie
    // k truncates below the positive set
    val k2 = TextVector.cosineTopK(docs, "doc_id", "text", q, Dim, k = 2)
      .as[(Long, Double)].collect().toSeq
    assert(k2 == want.take(2))
  }

  test("encoded probe == fresh probe, bit-for-bit") {
    val rnd = new scala.util.Random(5L)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (0 until 200).map { i =>
      (i.toLong, (0 until 1 + rnd.nextInt(12))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val q = "alpha beta gamma delta"
    val fresh = TextVector.cosineTopK(docs, "doc_id", "text", q, Dim, 20)
      .as[(Long, Double)].collect().toSeq
    val enc = TextVector.encode(docs, "doc_id", "text", Dim)
    val stored = TextVector.cosineTopKEncoded(enc, "doc_id", "tf_counts", q, Dim, 20)
      .as[(Long, Double)].collect().toSeq
    assert(stored == fresh)
  }

  test("multi == single per query, one count pass for the batch") {
    val rnd = new scala.util.Random(17L)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val docs = (0 until 150).map { i =>
      (i.toLong, (0 until 1 + rnd.nextInt(10))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val queries = Seq((100L, "alpha beta"), (200L, "gamma delta epsilon"))
    val multi = TextVector.cosineTopKMulti(docs, "doc_id", "text", queries, Dim, 7)
      .as[(Long, Long, Double)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(t => (-t._2, t._1))).toMap
    queries.foreach { case (qid, qText) =>
      val single = TextVector.cosineTopK(docs, "doc_id", "text", qText, Dim, 7)
        .as[(Long, Double)].collect().toSeq
      assert(multi(qid) == single, s"multi diverges from single for query $qid")
    }
    val e = intercept[IllegalArgumentException](
      TextVector.cosineTopKMulti(docs, "doc_id", "text",
        (0 until TextVector.MaxBatchQueries + 1).map(i => (i.toLong, "x")),
        Dim, 5))
    assert(e.getMessage.contains("MaxBatchQueries"))
  }

  test("contracts: dim bounds and positive k are loud") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      TextVector.cosineTopK(docs, "doc_id", "text", "x", 1, 5))
    assert(e.getMessage.contains("dim"))
    val e2 = intercept[IllegalArgumentException](
      TextVector.cosineTopK(docs, "doc_id", "text", "x", Dim, 0))
    assert(e2.getMessage.contains("k must be positive"))
  }
}
