package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graft.Bridge

class GraftExtensionsSpec extends SparkTestBase {

  import spark.implicits._

  test("extension function table builds working expressions (incl. arity check)") {
    val byName = GraftExtensions.functions
      .map { case (id, _, b) => id.funcName -> b }.toMap
    // a real JVM-wide withExtensions session can't be built inside the
    // shared-session test JVM; evaluate the injected builders directly
    val cos = Bridge.column(byName("vector_cosine")(Seq(
      Literal.create(Seq(1f, 0f)), Literal.create(Seq(1f, 0f)))))
    val h = Bridge.column(byName("poly_hash")(Seq(Literal.create("abc"))))
    val r = Seq(1).toDF("x").select(cos.as("c"), h.as("h")).head()
    assert(r.getDouble(0) == 1.0 && r.getLong(1) == 96354L)
    val err = intercept[IllegalArgumentException](byName("poly_hash")(Nil))
    assert(err.getMessage.contains("poly_hash requires 1 arguments"))
  }

  test("vector_* SQL builders coerce double-array literals (SQL numerics are double)") {
    graft.functions.GraftFunctions.register(spark)
    // array(1.0, 2.0) is array<double>; without the builder's cast every
    // naive SQL call failed analysis with a type mismatch
    val r = Seq(1).toDF("x")
      .selectExpr("vector_l2(array(3.0, 4.0), array(0.0, 0.0)) AS d",
        "vector_cosine(array(1, 0), array(1, 0)) AS c")
      .head()
    assert(r.getDouble(0) == 5.0 && r.getDouble(1) == 1.0)
  }

  test("a null vector ELEMENT yields an undefined (NaN) score, not a silent 0-fill") {
    graft.functions.GraftFunctions.register(spark)
    val r = Seq(1).toDF("x")
      .selectExpr("vector_l2(array(CAST(NULL AS FLOAT), CAST(1.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS d")
      .head()
    assert(r.getDouble(0).isNaN, s"null element scored ${r.getDouble(0)}")
  }

  test("column-composed SQL functions run via the session registry") {
    graft.functions.GraftFunctions.register(spark)
    val r = Seq("the cat is in a hat and it is fine")
      .toDF("text")
      .selectExpr("token_count(text) AS tc", "language_id(text) AS lang",
        "dup_word_frac(text) AS dwf", "gopher_gate(text) AS gate",
        "gram_stats(text) AS gs")
      .head()
    assert(r.getInt(0) == 10)
    assert(r.getString(1) == "en")
    assert(r.getDouble(2) > 0) // "is" repeats
    assert(!r.getBoolean(3))   // too short for the gate
    assert(r.getStruct(4).getLong(2) == 9L) // 9 bigrams from 10 tokens
  }

  test("r10 kernels on the SQL surface: entropy, dsir buckets, hashed-tf") {
    graft.functions.GraftFunctions.register(spark)
    val r = Seq("a b c d").toDF("text")
      .selectExpr("token_entropy(text) AS ent",
        "size(dsir_gram_buckets(text)) AS grams",
        "size(hashed_tf_counts(text)) AS sparse2m")
      .head()
    assert(r.getDouble(0) == math.log(4.0) ||
      math.abs(r.getDouble(0) - math.log(4.0)) < 1e-12)
    assert(r.getInt(1) == 7)  // 4 unigrams + 3 bigrams, position order
    assert(r.getInt(2) == 14) // sparse layout: 7 occupied buckets × 2
  }
}
