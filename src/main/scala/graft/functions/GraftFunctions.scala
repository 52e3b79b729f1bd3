package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration: exposes the engine's codegen'd expressions to
  * `spark.sql(...)` users (and to the score-name registry of the reference,
  * data/search.go:111-127, via the same names in SQL). */
object GraftFunctions {

  private def arity(name: String, n: Int, exprs: Seq[Expression]): Unit =
    require(exprs.length == n, s"$name requires $n arguments, got ${exprs.length}")

  private def unary(name: String, f: Expression => Expression)
      (implicit spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => { arity(name, 1, exprs); f(exprs.head) }, "scala_udf")

  private def binary(name: String, f: (Expression, Expression) => Expression)
      (implicit spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => { arity(name, 2, exprs); f(exprs.head, exprs(1)) }, "scala_udf")

  /** Register all engine functions on the session. */
  def register(implicit spark: SparkSession): Unit = {
    binary("vector_l2", VectorScore(_, _, ScoreKind.L2))
    binary("vector_l1", VectorScore(_, _, ScoreKind.L1))
    binary("vector_dot", VectorScore(_, _, ScoreKind.Dot))
    binary("vector_cosine", VectorScore(_, _, ScoreKind.Cosine))
    binary("vector_angular", VectorScore(_, _, ScoreKind.Angular))
    unary("poly_hash", PolyHash(_, 31L))
    unary("word_shingles", WordShingles(_, 3))
  }
}
