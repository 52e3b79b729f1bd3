package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[GjsonPath]] — the gjson-parity filter subset (VERDICT r4 #5). */
class GjsonPathSpec extends SparkTestBase {

  import spark.implicits._

  /** Evaluates the DEFAULT path (kernel for wildcard/query paths, single
    * native probe for dotted ones) AND the HOF-column executable spec,
    * asserting they agree — every case in this suite is differential. */
  private def ex(json: String, path: String): Boolean = {
    val r = Seq(json).toDF("j")
      .select(GjsonPath.exists(col("j"), path).as("e"),
        GjsonPath.existsColumn(col("j"), path).as("c"))
      .head
    assert(r.getBoolean(0) == r.getBoolean(1),
      s"kernel=${r.getBoolean(0)} column=${r.getBoolean(1)} for $path on $json")
    r.getBoolean(0)
  }

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
    // rest after the query: the matching element must carry it
    assert(ex(j, """tags.#(type=="news").w"""))
    assert(!ex(j, """tags.#(type=="blog").missing"""))
    // boolean literals
    assert(ex("""{"a":[{"on":true}]}""", "a.#(on==true)"))
    assert(!ex("""{"a":[{"on":false}]}""", "a.#(on==true)"))
    // an element without the field never matches, == or !=
    assert(!ex("""{"a":[{"x":1}]}""", """a.#(t=="v")"""))
    assert(!ex("""{"a":[{"x":1}]}""", """a.#(t!="v")"""))
    // dotted query fields: the element's NESTED field compares (round 6)
    val dj = """{"a":[{"b":{"c":"hit","n":2}},{"b":{"c":"miss"}}]}"""
    assert(ex(dj, """a.#(b.c=="hit")"""))
    assert(!ex(dj, """a.#(b.c=="nope")"""))
    assert(ex(dj, "a.#(b.n>=2)"))
    assert(!ex(dj, "a.#(b.n>2)"))
    assert(ex(dj, """a.#(b.c=="hit").b.n""")) // rest after a dotted query
    assert(!ex(dj, """a.#(b.c=="miss").b.n"""))
    // a container-valued field never matches a literal
    assert(!ex(dj, """a.#(b=="hit")"""))
  }

  test("#(...)# all-matches form: existence = non-empty match list (round 7)") {
    val j = """{"tags":[{"type":"news","w":3},{"type":"blog","w":1}]}"""
    assert(ex(j, """tags.#(type=="news")#"""))
    // the DOCUMENTED deviation: gjson's .Exists() on '#(...)#' is true
    // here too (the empty match list still exists as []); this engine
    // requires a non-empty match list, so a query with no matches is
    // false — a filter that can never exclude anything is not a filter
    assert(!ex(j, """tags.#(type=="video")#"""))
    assert(ex(j, "tags.#(w>2)#"))
    assert(!ex(j, "tags.#(w>3)#"))
    assert(!ex("""{"tags":[]}""", """tags.#(type=="news")#"""))
    assert(!ex("""{"tags":"x"}""", """tags.#(type=="news")#"""))
    assert(!ex("""{"other":1}""", """tags.#(type=="news")#"""))
    // continued path: some element satisfies AND carries the rest
    assert(ex(j, """tags.#(type=="news")#.w"""))
    assert(!ex(j, """tags.#(type=="news")#.missing"""))
    assert(!ex("""{"tags":[{"type":"news"}]}""", """tags.#(type=="news")#.w"""))
    // identical to the single-match form under this engine's SOME
    // semantics — pin the equivalence
    for (p <- Seq("""tags.#(type=="blog")""", "tags.#(w>=1)", "tags.#(w<1)"))
      assert(ex(j, p) == ex(j, p + "#"), p)
    // dotted query fields compose with the all-matches suffix
    val dj = """{"a":[{"b":{"c":"hit","n":2}},{"b":{"c":"miss"}}]}"""
    assert(ex(dj, """a.#(b.c=="hit")#"""))
    assert(!ex(dj, """a.#(b.c=="nope")#"""))
    assert(ex(dj, """a.#(b.c=="hit")#.b.n"""))
    assert(!ex(dj, """a.#(b.c=="miss")#.b.n"""))
  }

  test("#(cond) with a field-less compare: the element ITSELF matches (round 7)") {
    assert(ex("""{"nets":["fb","tw"]}""", """nets.#(=="fb")"""))
    assert(!ex("""{"nets":["ig"]}""", """nets.#(=="fb")"""))
    assert(ex("""{"ids":[1,2,3]}""", "ids.#(==2)"))
    assert(ex("""{"ids":[1,2,3]}""", "ids.#(>2)"))
    assert(!ex("""{"ids":[1,2,3]}""", "ids.#(>3)"))
    assert(ex("""{"ids":[1,2,3]}""", """ids.#(!="9")#""")) // with all-matches
    assert(!ex("""{"nets":"fb"}""", """nets.#(=="fb")""")) // not an array
    // a container element never matches a literal — including when its
    // raw JSON text equals the literal (the r7 review's divergence case:
    // the kernel's isValueNode guard and the column spelling's
    // starts-with-{[ guard must agree here)
    assert(!ex("""{"nets":[{"x":1}]}""", """nets.#(=="fb")"""))
    assert(!ex("""{"a":[[1]]}""", """a.#(=="[1]")"""))
  }

  test("#(nested path) existence conditions recurse through the grammar (round 7)") {
    val j = """{"friends":[{"nets":["fb","tw"],"age":44},{"nets":["ig"]}]}"""
    // the reference's own canonical example: friends.#(nets.#(=="fb"))#
    assert(ex(j, """friends.#(nets.#(=="fb"))#"""))
    assert(ex(j, """friends.#(nets.#(=="fb"))"""))
    assert(!ex(j, """friends.#(nets.#(=="mastodon"))#"""))
    // plain-path condition: SOME friend carrying the key
    assert(ex(j, "friends.#(age)"))
    assert(!ex(j, "friends.#(missing)"))
    // rest after a nested condition: the matching element carries it
    assert(ex(j, """friends.#(nets.#(=="fb")).age"""))
    assert(!ex(j, """friends.#(nets.#(=="ig")).age"""))
    // nested wildcard / # conditions
    assert(ex(j, "friends.#(nets.#)"))
    assert(ex(j, "friends.#(n*s.0)"))
    assert(!ex("""{"friends":"x"}""", "friends.#(age)"))
    // a query path STARTING with a query: element is an array whose
    // sub-element matches
    assert(ex("""{"m":[[1,5],[2]]}""", "m.#(#(>4))"))
    assert(!ex("""{"m":[[1,3],[2]]}""", "m.#(#(>4))"))
  }

  test("unsupported gjson syntax is rejected loudly, naming the subset") {
    for (p <- Seq("@reverse", "a.#(b~\"x\")",
        "a..b", "a.", "", "a.#(w>\"x\")", "a.#(b==\"x)",
        "a.#()", // empty condition
        "a.#(b=5)", // bare '='
        "a.b\\", // dangling escape
        "a.#(b\\==\"x\")", // escapes inside queries
        "a.b(c", "a.b~c")) {
      val e = intercept[IllegalArgumentException](GjsonPath.parse(p))
      assert(e.getMessage.contains("subset"), s"path $p: ${e.getMessage}")
    }
  }

  test("'@' modifiers and '~' fuzzy match: permanently closed scope, rejection names README") {
    // the scope decision (r7 verdict #4): these are not "not yet
    // implemented" — they are out of scope by design, and the failure
    // text must say so and point at the README section
    for (p <- Seq("a.@reverse", "friends.@values", "@this",
        "vitals.#(sev~\"hi*\")", "a.b~c")) {
      val e = intercept[IllegalArgumentException](GjsonPath.parse(p))
      assert(e.getMessage.contains("permanently out of scope"),
        s"path $p: ${e.getMessage}")
      assert(e.getMessage.contains("README"), s"path $p: ${e.getMessage}")
    }
    // escaped forms stay literal key characters, not modifiers
    assert(ex("""{"@this":1}""", "\\@this"))
    assert(ex("""{"a~b":1}""", "a\\~b"))
    assert(!ex("""{"ab":1}""", "a\\~b"))
  }

  test("key wildcards: * and ? match SOME key carrying the rest") {
    val j = """{"file_a":{"size":3},"file_bc":{"name":"n"},"x":{"size":9}}"""
    assert(ex(j, "file_*.size")) // file_a
    assert(!ex(j, "file_*.missing"))
    assert(ex(j, "file_?.size")) // ? = one char: file_a only
    assert(!ex(j, "file_?.name")) // file_bc needs TWO chars
    assert(ex(j, "file_??.name"))
    assert(ex(j, "*.size")) // any key
    assert(ex(j, "f*c.name")) // star spans a run
    assert(!ex(j, "g*.size"))
    assert(!ex("""{"a":[1,2]}""", "*.size")) // arrays have no keys
    assert(!ex("""[1,2]""", "*")) // root array: no keys
    assert(ex(j, "?.size")) // single-char key x
    // wildcard then deeper structure
    assert(ex("""{"meta_v2":{"tags":[{"t":1}]}}""", "meta_*.tags.#.t"))
  }

  test("escapes: \\ makes the next char a literal key character") {
    assert(ex("""{"a.b":1}""", "a\\.b"))
    assert(!ex("""{"a":{"b":1}}""", "a\\.b"))
    assert(ex("""{"a*b":1}""", "a\\*b")) // escaped star is literal
    assert(!ex("""{"axb":1}""", "a\\*b"))
    assert(ex("""{"a?":1}""", "a\\?"))
    assert(ex("""{"#":1}""", "\\#")) // escaped hash is a key
    assert(ex("""{"2":1}""", "\\2")) // escaped digit: object key, not index
    assert(!ex("""[9,8,7]""", "\\2"))
    assert(ex("""{"a b":1}""", "a\\ b"))
    // escape inside a wildcard segment stays literal
    assert(ex("""{"f.x_1":{"v":1}}""", "f\\.x_*.v"))
    assert(!ex("""{"fx_1":{"v":1}}""", "f\\.x_*.v"))
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

  test("kernel == column spelling on random documents (property sweep)") {
    val rnd = new scala.util.Random(5)
    def scalar(): String = rnd.nextInt(5) match {
      case 0 => "\"news\""
      case 1 => "\"blog\""
      case 2 => rnd.nextInt(6).toString
      case 3 => if (rnd.nextBoolean()) "true" else "false"
      case _ => "null"
    }
    def elem(): String = rnd.nextInt(3) match {
      case 0 => s"""{"type":${scalar()},"w":${rnd.nextInt(6)}}"""
      case 1 => s"""{"w":${scalar()}}"""
      case _ => scalar()
    }
    def doc(): String = {
      val tags = rnd.nextInt(4) match {
        case 0 => "[" + Seq.fill(rnd.nextInt(4))(elem()).mkString(",") + "]"
        case 1 => scalar()
        case 2 => s"""{"x":1}"""
        case _ => "[]"
      }
      val ids = if (rnd.nextBoolean())
        "[" + Seq.fill(rnd.nextInt(3))(rnd.nextInt(9).toString).mkString(",") + "]"
      else scalar()
      s"""{"tags":$tags,"ids":$ids,"a":{"b":${scalar()}}}"""
    }
    val paths = Seq("a", "a.b", "tags", "tags.#", "tags.#.type", "tags.#.w",
      """tags.#(type=="news")""", "tags.#(w>2)", "tags.#(w<=3)",
      """tags.#(type!="blog")""", "tags.#(w==true)", "ids.1", "tags.0.type",
      """tags.#(type=="news").w""",
      """tags.#(type=="news")#""", "tags.#(w>2)#", """tags.#(type!="blog")#.w""",
      "ids.#(==2)", "ids.#(>5)", """ids.#(!="3")""", "tags.#(w)", "tags.#(w.x)",
      "tags.#(type).w", "tags.#(t*e)",
      "t*s.#", "ta?s.#.type", "*.b", "i*s.1", "t*.#(w>2)", "t*.#(w>2)#")
    val docs = Seq.fill(300)(doc()).toDF("j")
    val cols = paths.zipWithIndex.flatMap { case (p, i) =>
      Seq(GjsonPath.exists(col("j"), p).as(s"k$i"),
        GjsonPath.existsColumn(col("j"), p).as(s"c$i")) }
    val rows = docs.select(col("j") +: cols: _*).collect()
    rows.foreach { r =>
      paths.indices.foreach { i =>
        assert(r.getBoolean(1 + 2 * i) == r.getBoolean(2 + 2 * i),
          s"path ${paths(i)} diverged on ${r.getString(0)}")
      }
    }
  }

  test("existsAll: conjunctive == fold of exists, with ONE kernel expression") {
    // differential over the property-sweep docs: AND-fold of exists vs
    // the shared-parse existsAll must agree on every doc
    val rnd = new scala.util.Random(9)
    def doc(): String = rnd.nextInt(4) match {
      case 0 => """{"tags":[{"type":"news","w":3}],"ids":[7,8],"a":{"b":1}}"""
      case 1 => """{"tags":[{"type":"blog"}],"ids":[7]}"""
      case 2 => """{"tags":"x","a":{"b":2}}"""
      case _ => "not json at all"
    }
    val paths = Seq("a.b", "tags.#", """tags.#(type=="news")""", "ids.1", "t*s.#.type")
    val docs = Seq.fill(120)(doc()).toDF("j")
    val rows = docs.select(col("j"),
      GjsonPath.existsAll(col("j"), paths).as("all"),
      paths.map(p => GjsonPath.exists(col("j"), p)).reduce(_ && _).as("fold"))
      .collect()
    rows.foreach(r => assert(r.getBoolean(1) == r.getBoolean(2),
      s"existsAll diverged from the fold on ${r.getString(0)}"))
    // plan shape: the 3 kernel-routed paths above collapse into ONE
    // gjson_exists_all (one Jackson parse per row); the plain a.b and
    // ids.1 paths stay native get_json_object probes
    val plan = docs.select(GjsonPath.existsAll(col("j"), paths).as("e"))
      .queryExecution.analyzed.toString
    assert("gjson_exists_all".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains(" gjson_exists("), plan)
    assert("get_json_object".r.findAllIn(plan).size == 2, plan)
    // degenerate forms
    assert(Seq("{}").toDF("j").select(GjsonPath.existsAll(col("j"), Nil).as("e"))
      .head.getBoolean(0))
    intercept[IllegalArgumentException](
      GjsonPath.existsAll(col("j"), Seq("a", "@bad")))
  }

  test("an INVALID path ending in ')#' does not consume the one-shot " +
      "all-matches migration warning (ADVICE r8)") {
    // the latch is once-per-JVM; reset it for this test (this suite is
    // the only sbt-test code parsing '#(' paths, and runs sequentially)
    GjsonPath.warnedAllMatches.set(false)
    // invalid: '@' modifier inside the query → throws during segment
    // validation, AFTER tokenization sees the terminal ')#' shape
    intercept[IllegalArgumentException](
      GjsonPath.parse("""tags.#(@reverse=="x")#"""))
    assert(!GjsonPath.warnedAllMatches.get,
      "failed parse consumed the single migration warning")
    // the next VALID terminal all-matches filter still gets the warning
    GjsonPath.parse("""tags.#(type=="news")#""")
    assert(GjsonPath.warnedAllMatches.get,
      "valid all-matches parse did not claim the warning latch")
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
