package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Cross-checks the codegen'd [[VectorScore]] expressions against the
  * HOF-composed executable spec on seeded random vectors, and verifies the
  * registry resolution semantics (data/search.go:111-127). */
class ScoreFunctionsSpec extends SparkTestBase {

  test("registry: unknown names fall back to VectorDistance (search.go:125-126)") {
    assert(ScoreFunctions.resolve("NoSuchFunction") == ScoreKind.L2)
    assert(ScoreFunctions.resolve("CosineSimilarity") == ScoreKind.Cosine)
    assert(ScoreFunctions.resolve("AnnoyAngularDistance") == ScoreKind.Angular)
  }

  test("Annoy prefix routes to the approximate scan (search.go:136-141)") {
    assert(ScoreFunctions.isApprox("AnnoyVectorDistance"))
    assert(!ScoreFunctions.isApprox("VectorDistance"))
  }

  test("HOF spec matches kernels on null ELEMENTS (NaN) and null ARRAYS (null)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val withNullElem = array(lit(1f), lit(null).cast("float"))
    val clean = array(lit(1f), lit(2f))
    for (kind <- ScoreKind.all) {
      val r = Seq(1).toDF("x").select(
        ScoreFunctions.hof(kind, withNullElem, clean).as("hof"),
        ScoreFunctions.score(kind, withNullElem, clean).as("kernel")).head
      assert(r.getDouble(0).isNaN, s"$kind hof on null element: ${r.get(0)}")
      assert(r.getDouble(1).isNaN, s"$kind kernel on null element: ${r.get(1)}")
      val rn = Seq(1).toDF("x").select(
        ScoreFunctions.hof(kind, lit(null).cast("array<float>"), clean)).head
      assert(rn.isNullAt(0), s"$kind hof on null array: ${rn.get(0)}")
    }
  }

  test("expression == HOF spec on random vectors (incl. unequal lengths)") {
    val rnd = new scala.util.Random(7L)
    val rows = Seq.tabulate(200) { i =>
      val la = 1 + rnd.nextInt(16)
      val lb = if (i % 3 == 0) la else 1 + rnd.nextInt(16) // mix equal/unequal
      (Seq.fill(la)(rnd.nextFloat() * 2 - 1), Seq.fill(lb)(rnd.nextFloat() * 2 - 1))
    } :+ ((Seq(0f, 0f), Seq(1f, 2f))) // zero-norm edge
    import spark.implicits._
    val df = rows.toDF("a", "b")
    for (kind <- ScoreKind.all) {
      val bad = df
        .select(
          ScoreFunctions.score(kind, col("a"), col("b")).as("expr"),
          ScoreFunctions.hof(kind, col("a"), col("b")).as("hof"))
        .filter(abs(col("expr") - col("hof")) > 1e-9)
        .count()
      assert(bad == 0, s"$kind: expression and HOF spec disagree")
    }
  }

  test("PolyHash and WordShingles stay inside whole-stage codegen") {
    val df = spark.range(2)
      .select(concat(lit("doc "), col("id"), lit(" alpha beta gamma")).as("t"))
      .select(PolyHash(col("t"), 31L).as("h"), WordShingles(col("t"), 3).as("sh"))
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, s"no codegen span:\n${df.queryExecution.executedPlan}")
    assert(df.count() == 2)
  }

  test("expression survives whole-stage codegen (plan contains codegen span)") {
    // build from range() with a non-foldable input — a local Seq collapses to
    // LocalTableScan and all-literal args constant-fold, either of which
    // would make this test vacuous
    val df = spark.range(1)
      .select(
        array(lit(1f), lit(2f)).as("a"),
        array((col("id") + 3).cast("float"), lit(4f)).as("b"))
      .select(ScoreFunctions.vectorDistance(col("a"), col("b")).as("s"))
    val codegenSpans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty,
      s"no codegen span in:\n${df.queryExecution.executedPlan}")
    assert(df.head.getDouble(0) === math.sqrt(8.0))
  }
}
