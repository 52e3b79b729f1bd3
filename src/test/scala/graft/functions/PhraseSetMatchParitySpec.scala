package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[PhraseSetMatchExpr]] (Aho–Corasick) == the or-tree spelling, on
  * randomized phrase lists over randomized corpora — including patterns
  * that are prefixes/suffixes of each other (the fail-link/terminal-
  * propagation cases) and lists crossing the dispatch threshold. */
class PhraseSetMatchParitySpec extends SparkTestBase {
  import spark.implicits._

  private def orTree(joined: org.apache.spark.sql.Column,
      norm: Seq[String]): org.apache.spark.sql.Column = {
    def orAll(cs: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
      if (cs.length == 1) cs.head
      else orAll(cs.grouped(2)
        .map(g => if (g.length == 2) g(0) || g(1) else g(0)).toSeq)
    orAll(norm.map(p => joined.contains(s" $p ")))
  }

  test("automaton == or-tree on randomized lists and corpora") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "yy", "al",
      "alphabet", "bet", "ga")
    // 2-3-token phrases over a 10-word vocab: individually selective
    // enough that both hit and miss docs exist in every trial
    def phrase() = (0 until 2 + rnd.nextInt(2))
      .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    def doc() = (0 until 2 + rnd.nextInt(6))
      .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = (0 until 400).map(i => (i.toLong, doc())).toDF("id", "text")
    for (trial <- 0 until 5) {
      val norm = (0 until 80).map(_ => phrase()).distinct
      val joined = concat(lit(" "),
        array_join(TextAnalysis.tokens(col("text")), " "), lit(" "))
      val got = docs.select(col("id"),
          PhraseSetMatchExpr(joined, norm.map(p => s" $p ")).as("m"))
        .as[(Long, Boolean)].collect().toMap
      val want = docs.select(col("id"), orTree(joined, norm).as("m"))
        .as[(Long, Boolean)].collect().toMap
      assert(got === want, s"trial $trial diverged")
      assert(got.values.exists(identity) && got.values.exists(!_),
        s"trial $trial degenerate (all ${got.values.head})")
    }
  }

  test("suffix-of-another-pattern terminals fire (fail-link propagation)") {
    // " beta x " is a suffix of the path spelled by " alpha beta x ";
    // walking "q alpha beta x q" must fire via the fail chain even
    // though the trie path taken is the longer pattern's
    val norm = Seq("alpha beta x q q", "beta x")
    val got = Seq("q alpha beta x q")
      .toDF("text")
      .select(PhraseSetMatchExpr(
        concat(lit(" "), array_join(TextAnalysis.tokens(col("text")), " "),
          lit(" ")), norm.map(p => s" $p ")).as("m"))
      .as[Boolean].head()
    assert(got)
  }

  test("the full gate (padded-tokens kernel + automaton) keeps WSCG") {
    // spark.range (not a local relation, which the optimizer collapses);
    // >64 phrases forces the automaton dispatch path
    val df = spark.range(100).select(col("id"),
      concat(lit("doc "), col("id").cast("string"),
        when(col("id") % 10 === 0, lit(" slow scan")).otherwise(lit(""))).as("text"))
    val big = Seq("slow scan") ++ (0 until 100).map(i => s"nohit $i")
    assert(big.length > TextAnalysis.PhraseOrTreeMax)
    val filtered = df.filter(TextAnalysis.containsAnyPhrase(col("text"), big))
    // a codegen'd Filter prints with the WholeStageCodegen star `*(n)`;
    // the r10 CodegenFallback spelling left it bare
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("Filter") && l.contains("*(")),
      s"phrase gate fell out of whole-stage codegen:\n$plan")
    assert(filtered.count() === 10L)
    // the or-tree dispatch path keeps WSCG too
    val small = df.filter(
      TextAnalysis.containsAnyPhrase(col("text"), Seq("slow scan")))
    val planS = small.queryExecution.executedPlan.toString
    assert(planS.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("*(")), planS)
    assert(small.count() === 10L)
  }

  test("paddedTokens kernel == the HOF token-rebuild, byte for byte") {
    val rnd = new scala.util.Random(7)
    val pieces = Vector("alpha", "BETA", "Größe", "草早", " ", "\t", "\n",
      "\u000B", "\f", "\r", "x", "", "éÉ", "😀" /* emoji */)
    val docs = ((0 until 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(8))
        .map(_ => pieces(rnd.nextInt(pieces.size))).mkString)
    } ++ Seq((1000L, ""), (1001L, "   \t\n"))).toDF("id", "text")
    val hof = concat(lit(" "),
      array_join(TextAnalysis.tokens(col("text")), " "), lit(" "))
    val mism = docs
      .select(PaddedTokensExpr(col("text")).as("k"), hof.as("h"))
      .filter(col("k") =!= col("h")).count()
    assert(mism === 0L)
  }

  test("containsAnyPhrase dispatches past the threshold, same answers") {
    val docs = Seq((1L, "the slow scan here"), (2L, "all clean"))
      .toDF("id", "text")
    val big = Seq("slow scan") ++ (0 until 100).map(i => s"nohit $i")
    assert(big.length > TextAnalysis.PhraseOrTreeMax)
    val got = docs.select(col("id"),
        TextAnalysis.containsAnyPhrase(col("text"), big).as("m"))
      .as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> true, 2L -> false))
  }
}
