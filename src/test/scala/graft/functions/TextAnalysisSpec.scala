package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {

  import spark.implicits._
  import TextAnalysis._

  private def one[T](text: String, c: org.apache.spark.sql.Column): T =
    Seq(text).toDF("text").select(c).head.get(0).asInstanceOf[T]

  test("luhnValid + redactCards: checksum separates cards from digit runs") {
    import org.apache.spark.sql.functions.{col, lit}
    def luhn(d: String): Boolean =
      one[Boolean](d, TextAnalysis.luhnValid(col("text")))
    assert(luhn("4532015112830366") && luhn("379354508162306"))
    assert(!luhn("1234567890123456") && !luhn("4532015112830367"))
    def red(t: String): String =
      one[String](t, TextAnalysis.redactCards(col("text")))
    // valid spaced card redacts; invalid run and short refs survive
    assert(red("pay 4532 0151 1283 0366 ref 99")
      === "pay [CARD] ref 99")
    assert(red("order 1234 5678 9012 3456 stays")
      === "order 1234 5678 9012 3456 stays")
    // two cards, one invalid: only the valid one goes
    assert(red("a 379-3545-0816-2306 b 1234567890123 c")
      === "a [CARD] b 1234567890123 c")
    assert(red("no digits at all") === "no digits at all")
  }

  test("redactSecrets/redactIps: mixed-class keys go, long words/numbers stay") {
    import org.apache.spark.sql.functions.col
    def red(t: String): String =
      one[String](t, TextAnalysis.redactIps(
        TextAnalysis.redactSecrets(col("text"))))
    assert(red("k sk_A1b2C3d4E5f6G7h8J9k0Qw end") === "k [SECRET] end")
    // pure-letter 30-char word and pure-digit 24-char run survive
    assert(red("w abcdefghijklmnopqrstuvwxyzabcd n 123456789012345678901234 e")
      === "w abcdefghijklmnopqrstuvwxyzabcd n 123456789012345678901234 e")
    assert(red("from 192.168.0.1 port") === "from [IP] port")
    assert(red("short sk1 stays") === "short sk1 stays")
  }

  test("containsAnyPhrase: token boundaries, multi-token runs, normalization") {
    import org.apache.spark.sql.functions.col
    def hit(text: String, phrases: Seq[String]): Boolean =
      one[Boolean](text, containsAnyPhrase(col("text"), phrases))
    assert(hit("a slow scan here", Seq("slow scan")))
    assert(!hit("slowscan compound", Seq("slow scan")))
    assert(!hit("slow scanning next", Seq("slow scan"))) // token boundary
    assert(hit("ends with slow scan", Seq("slow scan"))) // boundary at EOL
    assert(hit("SLOW   Scan spaced", Seq("  Slow  SCAN ")))  // normalization
    assert(!hit("totally clean", Seq("slow scan", "broken pipe")))
    assert(hit("one broken pipe", Seq("slow scan", "broken pipe")))
    val e = intercept[IllegalArgumentException](
      containsAnyPhrase(col("text"), Nil))
    assert(e.getMessage.contains("empty phrase list"))
  }

  test("tokenCount: whitespace runs, empties dropped") {
    assert(one[Int]("the cat  sat ", tokenCount(col("text"))) == 3)
    assert(one[Int]("", tokenCount(col("text"))) == 0)
  }

  test("tokenEntropy: uniform = ln k, repetition lowers, sorted fold exact") {
    // k distinct tokens once each → H = ln k (folded in sorted order)
    val lnK = (1 to 4).map(_ => -(0.25 * math.log(0.25))).sum
    assert(one[Double]("a b c d", tokenEntropy(col("text"))) == lnK)
    // all-same tokens → 0; empty → 0
    assert(one[Double]("x x x x", tokenEntropy(col("text"))) == 0.0)
    assert(one[Double]("", tokenEntropy(col("text"))) == 0.0)
    // case folds before counting (the shared tokenizer)
    assert(one[Double]("A a", tokenEntropy(col("text"))) == 0.0)
    // skewed beats uniform from below: 3-of-4 repeats < ln 2
    val skew = one[Double]("a a a b", tokenEntropy(col("text")))
    assert(skew > 0 && skew < math.log(2))
    // kernel == driver reference on a mixed doc (exact fold order)
    val text = "the cat sat on the mat the end"
    val toks = text.split(" ").toSeq
    val n = toks.size.toDouble
    val want = toks.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (_, g) => val p = g.size / n; -(p * math.log(p)) }
      .foldLeft(0.0)(_ + _)
    assert(one[Double](text, tokenEntropy(col("text"))) == want)
  }

  test("bpeish: letter runs, digit runs, single punct glyphs") {
    assert(one[Int]("key agg, row 42!", bpeishTokenCount(col("text"))) == 6)
  }

  test("fingerprint matches the polynomial spec") {
    // ((0*31+97)*31+98)*31+99 = 96354
    assert(one[Long]("abc", fingerprint(col("text"))) == 96354L)
  }

  test("languageId: argmax with en-first tie-break, und on zero hits") {
    assert(one[String]("the cat is in the hat", languageId(col("text"))) == "en")
    assert(one[String]("der hund ist ein tier und", languageId(col("text"))) == "de")
    assert(one[String]("xyzzy qwerty", languageId(col("text"))) == "und")
    // "un" is in both fr and es lists -> tie broken to fr (list order)
    assert(one[String]("un", languageId(col("text"))) == "fr")
  }

  test("qualityScore in [0,1]; stopwords raise it, punctuation lowers it") {
    val hi = one[Double]("the cat is in the hat and it is a good day to play", qualityScore(col("text")))
    val lo = one[Double]("!!! ??? ### $$$ %%%", qualityScore(col("text")))
    assert(hi > lo)
    assert(hi >= 0 && hi <= 1 && lo >= 0 && lo <= 1)
  }

  test("NULL text scores NULL, never 0.7 (least() skips nulls)") {
    val r = Seq(Option.empty[String]).toDF("text")
      .select(qualityScore(col("text"))).head
    assert(r.isNullAt(0), s"NULL doc scored ${r.get(0)} — would pass quality gates")
  }

  test("bpeish: newlines and tabs are separators, not counted glyphs") {
    assert(one[Int]("line one\nline two", bpeishTokenCount(col("text"))) == 4)
    assert(one[Int]("a\tb", bpeishTokenCount(col("text"))) == 2)
  }

  test("gopherGate single-pass spelling decides identically to the named signals") {
    val t = GopherThresholds()
    // the executable spec of the fused gate: the per-signal conjunction
    val named =
      tokenCount(col("text")) >= t.minWords && tokenCount(col("text")) <= t.maxWords &&
        meanWordLength(col("text")) >= t.minMeanWordLen &&
        meanWordLength(col("text")) <= t.maxMeanWordLen &&
        symbolWordRatio(col("text")) <= t.maxSymbolWordRatio &&
        alphaWordFraction(col("text")) >= t.minAlphaWordFrac &&
        stopwordCount(col("text"), "en") >= t.minStopwordHits
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
      .unionByName(Seq(
        (900001L, ""), (900002L, "short doc"),
        (900003L, ("the cat and dog sat in a big warm hat today " * 6).trim),
        (900004L, ("#### " * 60).trim)).toDF("doc_id", "text"))
    val diff = docs.select(col("doc_id"),
        gopherGate(col("text")).as("fused"), named.as("named"))
      .filter(not(col("fused") <=> col("named")))
    assert(diff.isEmpty, s"gate divergence: ${diff.collect().mkString(",")}")
  }

  test("allWordGrams: non-distinct, ordered; empty below n tokens") {
    assert(one[scala.collection.Seq[String]]("a b a b", allWordGrams(col("text"), 2)).toSeq
      == Seq("a b", "b a", "a b"))
    assert(one[scala.collection.Seq[String]]("a b", allWordGrams(col("text"), 3)).isEmpty)
    assert(one[scala.collection.Seq[String]]("", allWordGrams(col("text"), 2)).isEmpty)
  }

  test("GramStats kernel equals the stats derived from allWordGrams (executable spec)") {
    val texts = Seq("a b a b a", "x", "", "one two three two three two", "a b c d")
    for (t <- texts; n <- Seq(2, 3)) {
      val kernel = one[org.apache.spark.sql.Row](t, graft.functions.GramStats(col("text"), n))
      val grams = one[scala.collection.Seq[String]](t, allWordGrams(col("text"), n)).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size)
      val topCover =
        if (counts.isEmpty) 0L
        else counts.map { case (g, c) => c.toLong * g.codePointCount(0, g.length) }.max
      val dupOcc = counts.values.filter(_ > 1).map(_.toLong).sum
      assert(kernel.getLong(0) == topCover, s"top_cover for '$t' n=$n")
      assert(kernel.getLong(1) == dupOcc, s"dup_occ for '$t' n=$n")
      assert(kernel.getLong(2) == grams.length.toLong, s"n_grams for '$t' n=$n")
    }
  }

  test("gopher signals: mean word len, alpha frac, symbol ratio, dup words") {
    assert(one[Double]("ab abcd", meanWordLength(col("text"))) == 3.0)
    assert(one[Double]("", meanWordLength(col("text"))) == 0.0)
    assert(one[Double]("cat 42 dog", alphaWordFraction(col("text"))) == 2.0 / 3)
    assert(one[Double]("x # y ... z #", symbolWordRatio(col("text"))) == 0.5)
    assert(one[Double]("a b a c b a", dupWordFraction(col("text"))) == 0.5)
    assert(one[Double]("a b c", dupWordFraction(col("text"))) == 0.0)
  }

  test("gopherGate: each rule can individually reject") {
    val pass = (("the cat and dog sat in the big warm hat today " * 5) +
      "extra words beyond fifty tokens are needed here now okay fine")
    assert(one[Boolean](pass, gopherGate(col("text"))))
    // too short
    assert(!one[Boolean]("the cat is in a hat", gopherGate(col("text"))))
    // no stopwords
    val noStops = "cat dog bird fish " * 20
    assert(!one[Boolean](noStops, gopherGate(col("text"))))
    // symbol-heavy
    val symbols = pass + (" #" * 30)
    assert(!one[Boolean](symbols, gopherGate(col("text"))))
  }
}
