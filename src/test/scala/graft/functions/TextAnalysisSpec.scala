package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {

  import spark.implicits._
  import TextAnalysis._

  private def one[T](text: String, c: org.apache.spark.sql.Column): T =
    Seq(text).toDF("text").select(c).head.get(0).asInstanceOf[T]

  test("tokenCount: whitespace runs, empties dropped") {
    assert(one[Int]("the cat  sat ", tokenCount(col("text"))) == 3)
    assert(one[Int]("", tokenCount(col("text"))) == 0)
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
}
