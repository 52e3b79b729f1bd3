package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupParagraphsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], minChars: Int = 1) =
    Dedup.dedupParagraphs(rows.toDF("doc_id", "text"), "doc_id", "text",
        "\n", minChars)
      .as[(Long, String)].collect().toMap

  test("keep-first across docs; untouched docs byte-identical") {
    val got = run(Seq(
      (1L, "unique one\nshared footer here\ntail one"),
      (2L, "unique two\nshared footer here\ntail two"),
      (3L, "totally clean document")))
    assert(got(1L) === "unique one\nshared footer here\ntail one")
    assert(got(2L) === "unique two\ntail two")
    assert(got(3L) === "totally clean document")
  }

  test("within-doc repeats dedup too; ownership is min (id, idx)") {
    val got = run(Seq(
      (5L, "para A\npara A\npara B"),
      (4L, "para B\npara Z")))
    // doc 4 < doc 5, so doc 4 owns "para B"; doc 5 keeps one "para A"
    assert(got(4L) === "para B\npara Z")
    assert(got(5L) === "para A")
  }

  test("sub-minChars segments are exempt: empties never cross-link docs") {
    val got = run(Seq(
      (1L, "aaaa\n\nbbbb\n"),
      (2L, "cccc\n\ndddd\n")), minChars = 2)
    // both docs keep their empty segments and trailing structure
    assert(got(1L) === "aaaa\n\nbbbb\n")
    assert(got(2L) === "cccc\n\ndddd\n")
  }

  test("a fully-duplicated doc collapses to the empty string") {
    val got = run(Seq(
      (1L, "same para"),
      (2L, "same para")))
    assert(got(1L) === "same para" && got(2L) === "")
  }

  test("scopeCols: identical paragraphs dedup within a scope, never across") {
    val df = Seq(
      (1L, "en", "shared para here\nen one"),
      (2L, "en", "shared para here\nen two"),
      (3L, "de", "shared para here\nde one"))
      .toDF("doc_id", "lang", "text")
    val got = Dedup.dedupParagraphs(df, "doc_id", "text", "\n",
        minChars = 1, scopeCols = Seq("lang"))
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got(1L) === "shared para here\nen one") // en owner
    assert(got(2L) === "en two")                   // en copy killed
    assert(got(3L) === "shared para here\nde one") // de scope untouched
    // global scope (default) kills both later copies
    val g2 = Dedup.dedupParagraphs(df, "doc_id", "text")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(g2(2L) === "en two" && g2(3L) === "de one")
  }

  test("stripHotParagraphs: df-hot drops EVERYWHERE; within-doc repeats not hot") {
    def runHot(rows: Seq[(Long, String)], minDf: Long) =
      Dedup.stripHotParagraphs(rows.toDF("doc_id", "text"), "doc_id",
          "text", "\n", minDf, minChars = 1)
        .as[(Long, String)].collect().toMap
    val got = runHot(Seq(
      (1L, "unique one\nsite footer\ntail one"),
      (2L, "unique two\nsite footer\ntail two"),
      (3L, "site footer\nsite footer")), minDf = 3)
    // df(site footer) = 3 distinct docs -> gone from ALL, incl. doc 3
    assert(got(1L) === "unique one\ntail one")
    assert(got(2L) === "unique two\ntail two")
    assert(got(3L) === "")
    // df = 2 < 3 stays everywhere; within-doc repetition alone never hot
    val got2 = runHot(Seq(
      (1L, "rep\nrep\nrep\nbody"),
      (2L, "other")), minDf = 2)
    assert(got2(1L) === "rep\nrep\nrep\nbody")
    val e = intercept[IllegalArgumentException](
      runHot(Seq((1L, "x")), minDf = 1))
    assert(e.getMessage.contains("strips everything"))
  }

  test("stripHotParagraphs scoping: per-site df, other scopes untouched") {
    val rows = (0 until 4).map(i => (i.toLong, "a.com", s"body $i\nsite footer a")) ++
      Seq((10L, "b.com", "body ten\nsite footer a"))
    val got = Dedup.stripHotParagraphs(rows.toDF("doc_id", "domain", "text"),
        "doc_id", "text", "\n", minDf = 3, minChars = 1,
        scopeCols = Seq("domain"))
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // a.com: footer df=4 >= 3 -> stripped from all four
    (0 until 4).foreach(i => assert(got(i.toLong) === s"body $i"))
    // b.com: same footer text, df=1 in ITS scope -> kept
    assert(got(10L) === "body ten\nsite footer a")
  }

  test("other columns pass through; reserved column refuses") {
    val df = Seq((1L, "x4x4\ny5y5", "en"), (2L, "y5y5\nz6z6", "de"))
      .toDF("doc_id", "text", "lang")
    val got = Dedup.dedupParagraphs(df, "doc_id", "text")
      .select("doc_id", "text", "lang").as[(Long, String, String)]
      .collect().map { case (i, t, l) => i -> ((t, l)) }.toMap
    assert(got(1L) === (("x4x4\ny5y5", "en")))
    assert(got(2L) === (("z6z6", "de")))
    val e = intercept[IllegalArgumentException](
      Dedup.dedupParagraphs(df.withColumn("__kill", lit(1)),
        "doc_id", "text"))
    assert(e.getMessage.contains("__kill"))
  }

  test("hash128 lane: identical results, wider shuffle key (all four ops)") {
    // paragraph corpora with dups, scoped rows, within-doc repeats
    val rows = Seq(
      (1L, "aaaa\nshared body\nbbbb"), (2L, "shared body\ncccc"),
      (3L, "dddd\nshared body"), (4L, "eeee\neeee"),
      (5L, "hot line one\nunique 5"), (6L, "hot line one\nunique 6"),
      (7L, "hot line one\nunique 7"))
    val df = rows.toDF("doc_id", "text")
    def m(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(
      m(Dedup.dedupParagraphs(df, "doc_id", "text", "\n", 1, Nil, hash128 = true))
        === m(Dedup.dedupParagraphs(df, "doc_id", "text")))
    assert(
      m(Dedup.stripHotParagraphs(df, "doc_id", "text", "\n", 3L, 1, Nil,
        hash128 = true))
        === m(Dedup.stripHotParagraphs(df, "doc_id", "text", "\n", 3L)))
    // word-gram corpora for the substring/span ops
    val g = Seq(
      (1L, "u1 u2 the same five token passage here t1"),
      (2L, "v1 the same five token passage here v2 v3"),
      (3L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    assert(
      m(Dedup.dedupSubstrings(g, "doc_id", "text", n = 5, hash128 = true))
        === m(Dedup.dedupSubstrings(g, "doc_id", "text", n = 5)))
    assert(
      m(Dedup.stripHotSpans(g, "doc_id", "text", n = 5, minDf = 2,
        hash128 = true))
        === m(Dedup.stripHotSpans(g, "doc_id", "text", n = 5, minDf = 2)))
    // the wide lane actually carries both hash columns through its plan
    val plan = Dedup.dedupParagraphs(df, "doc_id", "text", "\n", 1, Nil,
      hash128 = true).queryExecution.optimizedPlan.toString
    assert(plan.contains("h2"), plan)
  }
}
