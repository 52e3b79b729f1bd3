package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LangIdSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val model = LangId.train(
    LangIdFixture.Train.toDF("lang", "text"), "lang", "text",
    nMax = 5, vocabCap = 20000)

  test("train: sorted classes, capped vocab, full-mass totals") {
    assert(model.langs === LangIdFixture.Langs)
    assert(model.langs.size === 26)
    assert(model.vocabSize <= 20000)
    assert(model.terms.map(_._1) === model.terms.map(_._1).sorted)
    // totals see ALL gram mass, not just the kept vocabulary
    val perLangKept = model.langs.indices.map(i =>
      model.terms.map(_._2(i)).sum)
    model.langs.indices.foreach(i =>
      assert(model.totals(i) >= perLangKept(i)))
    // every language contributed grams
    assert(model.totals.forall(_ > 0L))
  }

  test("held-out accuracy >= 98% across 26 languages, 0 'und'") {
    val held = LangIdFixture.HeldOut.zipWithIndex
      .map { case ((l, t), i) => (i.toLong, l, t) }
      .toDF("sid", "truth", "text")
    val scored = LangId.scoreDocs(held, "sid", "text", model,
      passthrough = Seq("truth"))
    val rows = scored.select("sid", "truth", "lang_pred", "n_hit")
      .as[(Long, String, String, Int)].collect()
    assert(rows.length === LangIdFixture.HeldOut.size)
    assert(rows.forall(_._4 > 0))
    val wrong = rows.filter(r => r._2 != r._3)
    val acc = (rows.length - wrong.length).toDouble / rows.length
    val detail = wrong.map(r => s"sid=${r._1} truth=${r._2} pred=${r._3}")
      .mkString("; ")
    assert(acc >= 0.98, s"held-out accuracy $acc — misses: $detail")
    // the non-Latin scripts must be PERFECT (script alone separates them)
    val scripts = Set("ru", "uk", "el", "ar", "he", "hi", "zh", "ja", "ko")
    assert(wrong.forall(r => !scripts.contains(r._2)),
      s"script-separable language missed: $detail")
  }

  test("zero-hit and empty docs predict 'und' with score 0") {
    val df = Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = LangId.scoreDocs(df, "id", "text", model)
      .select("id", "n_hit", "lang_pred", "lid_score")
      .as[(Long, Int, String, Double)].collect().sortBy(_._1)
    got.foreach { case (_, nHit, pred, score) =>
      assert(nHit === 0)
      assert(pred === LangId.Undetermined)
      assert(score === 0d)
    }
  }

  test("save/load round-trips the model exactly") {
    val dir = java.nio.file.Files.createTempDirectory("lid").toString
    LangId.lidSave(spark, dir, model)
    val back = LangId.lidLoad(spark, dir)
    assert(back.langs === model.langs)
    assert(back.nMax === model.nMax && back.vocabCap === model.vocabCap)
    assert(back.totals.toSeq === model.totals.toSeq)
    assert(back.terms.map(_._1) === model.terms.map(_._1))
    assert(back.terms.map(_._2.toSeq) === model.terms.map(_._2.toSeq))
  }

  test("charGrams: flattened (n, pos) order over normalized text") {
    val got = Seq("Ab c").toDF("t")
      .select(LangId.charGrams(col("t"), 2)).as[Seq[String]].head
    // normalized = " ab c " (ASCII-lowercased, padded)
    assert(got === Seq(
      " ", "a", "b", " ", "c", " ",
      " a", "ab", "b ", " c", "c "))
    // short string: n windows that don't fit contribute nothing
    val one = Seq("x").toDF("t")
      .select(LangId.charGrams(col("t"), 3)).as[Seq[String]].head
    assert(one === Seq(" ", "x", " ", " x", "x ", " x "))
  }

  test("scoreDocs refuses reserved column collisions, any case") {
    val df = Seq((1L, "hello", "x")).toDF("id", "text", "Pos")
    val e = intercept[IllegalArgumentException](
      LangId.scoreDocs(df, "id", "text", model, passthrough = Seq("Pos")))
    assert(e.getMessage.contains("reserves"))
  }

  test("scoring plan: pure map-side kernel — no exchange, no join at all") {
    val df = spark.range(50).select(col("id"),
      concat(lit("where is the station "), col("id").cast("string")).as("text"))
    val plan = LangId.scoreDocs(df, "id", "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"lid scoring must be one map stage:\n$plan")
    // the WholeStageCodegen star marker on the scoring projection
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.contains("*(")), plan)
  }

  test("kernel == expanded DataFrame spelling, row-identical") {
    // held-out fixture (26 scripts) + empty/blank/null edge docs
    val rows = LangIdFixture.HeldOut.zipWithIndex
      .map { case ((_, t), i) => (i.toLong, t) } ++
      Seq((1000L, ""), (1001L, "   "), (1002L, null.asInstanceOf[String]),
        (1003L, "MiXeD CaSe The Station"), (1004L, "a\tb\ncd"))
    val df = rows.toDF("id", "text")
    def grab(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "n_hit", "lang_pred", "lid_score")
        .selectExpr("id", "cast(n_hit as int) n_hit", "lang_pred", "lid_score")
        .as[(Long, Int, String, Double)].collect().sortBy(_._1).toSeq
    val kernel = grab(LangId.scoreDocs(df, "id", "text", model))
    val expanded = grab(LangId.scoreDocsExpanded(df, "id", "text", model))
    assert(kernel === expanded)
  }

  test("LidGramsExpr == docGrams HOF spelling on every fixture row") {
    val df = (LangIdFixture.Train ++ LangIdFixture.HeldOut).map(_._2)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val mism = df.select(
        graft.functions.LidGramsExpr(col("text"), 5).as("k"),
        LangId.docGrams(col("text"), 5).as("h"))
      .filter(col("k") =!= col("h")).count()
    assert(mism === 0L)
  }
}
