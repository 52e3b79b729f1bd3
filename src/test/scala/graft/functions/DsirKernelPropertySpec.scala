package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Random sweep pinning the DSIR/hashed-TF kernels against independent
  * plain-Scala references on adversarial strings: unicode (multi-byte
  * UTF-8, non-BMP surrogate pairs), every whitespace class character,
  * repeated tokens, empty and whitespace-only inputs. The kernels run
  * the ASCII-fast-path poly hash with the multi-byte bail-out
  * ([[TextHash.poly]]) — this sweep is the regression net for that
  * bail-out agreeing with the decoded path, and for the
  * unigram-then-bigram position-order contract the DuckDB oracles
  * replay. Driver-only (no SparkSession): the expressions' static
  * kernels are the subject. */
class DsirKernelPropertySpec extends AnyFunSuite {

  private val B = 61 // prime: exposes modulo mistakes a power of two hides

  private def refTokens(text: String): Seq[String] =
    TextHash.WS.split(text.toLowerCase).filter(_.nonEmpty).toSeq

  private def refGrams(text: String): Seq[String] = {
    val t = refTokens(text)
    t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  private def refPoly(s: String): Long = {
    var h = 0L
    s.foreach(c => h = (h * 31 + c) % TextHash.Mod)
    h
  }

  private def randomText(rnd: scala.util.Random): String = {
    val ws = Seq(" ", "\t", "\n", "", "\f", "\r")
    val frags = Seq("alpha", "Beta", "GAMMA", "δοκιμή", "測試", "🚀x",
      "a", "1", "", "mixedCase", "café")
    (0 until rnd.nextInt(30)).map { _ =>
      if (rnd.nextBoolean()) frags(rnd.nextInt(frags.size))
      else ws(rnd.nextInt(ws.size)) * (1 + rnd.nextInt(2))
    }.mkString(if (rnd.nextBoolean()) " " else "")
  }

  test("gramBuckets == reference on random unicode strings") {
    val rnd = new scala.util.Random(4242L)
    for (_ <- 1 to 300) {
      val t = randomText(rnd)
      val got = DsirFeatures.gramBuckets(UTF8String.fromString(t), B)
        .toIntArray().toSeq
      val want = refGrams(t).map(g => (refPoly(g) % B).toInt)
      assert(got == want, s"gram order/hash drifted for ${t.take(60)}")
    }
  }

  test("bucketCountsDense == histogram of gramBuckets, always") {
    val rnd = new scala.util.Random(7L)
    for (_ <- 1 to 300) {
      val t = randomText(rnd)
      val dense = DsirFeatures.bucketCountsDense(UTF8String.fromString(t), B)
      val hist = new Array[Int](B)
      refGrams(t).foreach(g => hist((refPoly(g) % B).toInt) += 1)
      assert(dense.toSeq == hist.toSeq, s"counts drifted for ${t.take(60)}")
    }
  }

  test("logWeight folds ratios in gram position order, bit-for-bit") {
    val rnd = new scala.util.Random(99L)
    val ratios = Array.fill(B)(rnd.nextGaussian())
    for (_ <- 1 to 300) {
      val t = randomText(rnd)
      val want = refGrams(t).foldLeft(0.0)((a, g) =>
        a + ratios((refPoly(g) % B).toInt))
      assert(DsirFeatures.logWeight(UTF8String.fromString(t), ratios, B) == want,
        s"fold drifted for ${t.take(60)}")
    }
  }

  test("hashedCosine == exact integer-sum formula on random pairs") {
    val rnd = new scala.util.Random(13L)
    for (_ <- 1 to 200) {
      val doc = randomText(rnd)
      val query = randomText(rnd)
      val cq = {
        val h = new Array[Int](B)
        refGrams(query).foreach(g => h((refPoly(g) % B).toInt) += 1)
        h
      }
      val qn = cq.map(v => v.toLong * v).sum
      val cd = {
        val h = new Array[Int](B)
        refGrams(doc).foreach(g => h((refPoly(g) % B).toInt) += 1)
        h
      }
      val dot = cd.zip(cq).map { case (x, y) => x.toLong * y }.sum
      val a2 = cd.map(v => v.toLong * v).sum
      val want =
        if (a2 == 0L || qn == 0L) 0.0
        else dot.toDouble / (math.sqrt(a2.toDouble) * math.sqrt(qn.toDouble))
      assert(DsirFeatures.hashedCosine(UTF8String.fromString(doc), cq, qn) == want,
        s"cosine drifted for doc=${doc.take(40)} q=${query.take(40)}")
    }
  }
}
