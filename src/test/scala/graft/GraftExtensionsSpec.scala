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
}
