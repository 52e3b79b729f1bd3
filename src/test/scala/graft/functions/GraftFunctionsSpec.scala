package graft.functions

import graft.SparkTestBase

class GraftFunctionsSpec extends SparkTestBase {

  test("engine expressions are callable from SQL after register") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vector_l2(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS l2,
        |       vector_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cos,
        |       poly_hash('abc') AS h,
        |       word_shingles('a b c d') AS sh""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - math.sqrt(8.0)) < 1e-12)
    assert(r.getDouble(1) == 1.0)
    assert(r.getLong(2) == 96354L)
    assert(r.getSeq[String](3) == Seq("a b c", "b c d"))
  }
}
