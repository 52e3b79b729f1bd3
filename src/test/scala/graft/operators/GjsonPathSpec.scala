package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[GjsonPath]] — the gjson-parity filter subset (VERDICT r4 #5). */
class GjsonPathSpec extends SparkTestBase {

  import spark.implicits._

  private def ex(json: String, path: String): Boolean =
    Seq(json).toDF("j")
      .select(GjsonPath.exists(col("j"), path).as("e"))
      .head.getBoolean(0)

  test("dotted keys and nesting") {
    assert(ex("""{"a":{"b":{"c":1}}}""", "a.b.c"))
    assert(!ex("""{"a":{"b":{}}}""", "a.b.c"))
    assert(ex("""{"k":0}""", "k")) // 0 is present
    assert(!ex("""{"other":1}""", "k"))
  }

  test("integer segments index arrays") {
    assert(ex("""{"ids":[7,8]}""", "ids.1"))
    assert(!ex("""{"ids":[7]}""", "ids.1"))
    assert(ex("""{"a":[[1],[2,3]]}""", "a.1.1"))
  }

  test("# terminal: value is an array") {
    assert(ex("""{"tags":[]}""", "tags.#"))
    assert(ex("""{"tags":[1,2]}""", "tags.#"))
    assert(!ex("""{"tags":"x"}""", "tags.#"))
    assert(!ex("""{"tags":{"a":1}}""", "tags.#"))
    assert(!ex("""{"other":1}""", "tags.#"))
  }

  test("#.rest wildcard: SOME element carries the rest") {
    val j = """{"tags":[{"type":"news"},{"w":1}]}"""
    assert(ex(j, "tags.#.type"))
    assert(ex(j, "tags.#.w"))
    assert(!ex(j, "tags.#.missing"))
    assert(!ex("""{"tags":[]}""", "tags.#.type"))
    assert(!ex("""{"tags":"scalar"}""", "tags.#.type"))
    // deeper rest
    assert(ex("""{"a":[{"b":{"c":1}}]}""", "a.#.b.c"))
  }

  test("#(key op literal) queries") {
    val j = """{"tags":[{"type":"news","w":3},{"type":"blog","w":1}]}"""
    assert(ex(j, """tags.#(type=="news")"""))
    assert(!ex(j, """tags.#(type=="video")"""))
    assert(ex(j, """tags.#(type!="news")""")) // the blog element
    assert(ex(j, "tags.#(w>2)"))
    assert(!ex(j, "tags.#(w>3)"))
    assert(ex(j, "tags.#(w>=3)"))
    assert(ex(j, "tags.#(w<2)"))
    assert(ex(j, """tags.#(type=="news")#""")) // all-matches form, same existence
    // rest after the query: the matching element must carry it
    assert(ex(j, """tags.#(type=="news").w"""))
    assert(!ex(j, """tags.#(type=="blog").missing"""))
    // boolean literals
    assert(ex("""{"a":[{"on":true}]}""", "a.#(on==true)"))
    assert(!ex("""{"a":[{"on":false}]}""", "a.#(on==true)"))
    // an element without the field never matches, == or !=
    assert(!ex("""{"a":[{"x":1}]}""", """a.#(t=="v")"""))
    assert(!ex("""{"a":[{"x":1}]}""", """a.#(t!="v")"""))
  }

  test("unsupported gjson syntax is rejected loudly, naming the subset") {
    for (p <- Seq("a.*", "a.?x", "@reverse", "a.#(b~\"x\")", "a.#(b.c==\"x\")",
        "a.b\\.c", "a..b", "a.", "", "a.#(w>\"x\")", "a.#(b==\"x)")) {
      val e = intercept[IllegalArgumentException](GjsonPath.parse(p))
      assert(e.getMessage.contains("subset"), s"path $p: ${e.getMessage}")
    }
  }

  test("plain dotted filters keep the single-probe plan of round 4") {
    // analyzed plan (a literal LocalRelation constant-folds away in the
    // optimized one): consecutive key/index segments must collapse into
    // ONE get_json_object probe
    val df = Seq("""{"a":{"b":1}}""").toDF("j")
      .filter(GjsonPath.exists(col("j"), "a.b.0.c"))
    val plan = df.queryExecution.analyzed.toString
    assert("get_json_object".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("$.a.b[0].c"), plan)
  }

  test("passesFilters integration: conjunctive label + group filters") {
    val cfg = SearchConfig(
      filters = Seq("""tags.#(type=="news")"""), groupFilters = Seq("grp"),
      labelCol = "props", groupLabelCol = "gprops")
    val rows = Seq(
      (1L, """{"tags":[{"type":"news"}]}""", """{"grp":1}"""),
      (2L, """{"tags":[{"type":"blog"}]}""", """{"grp":1}"""),
      (3L, """{"tags":[{"type":"news"}]}""", """{"other":1}""")
    ).toDF("id", "props", "gprops")
    val got = rows.filter(Search.passesFilters(cfg)).select("id").as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }
}
