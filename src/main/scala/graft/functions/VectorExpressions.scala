package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Which scalar vector score to compute (SURVEY.md §2.3 E1-E5). */
sealed abstract class ScoreKind(val fnName: String, val higherIsBetter: Boolean)
object ScoreKind {
  case object L2 extends ScoreKind("l2", false)        // E1 VectorDistance
  case object L1 extends ScoreKind("l1", false)        // E2 QuickVectorDistance
  case object Dot extends ScoreKind("dot", true)       // E3 VectorMultiplication
  case object Cosine extends ScoreKind("cosine", true) // E4 CosineSimilarity
  case object Angular extends ScoreKind("angular", true) // E5 AngularDistance
  val all: Seq[ScoreKind] = Seq(L2, L1, Dot, Cosine, Angular)
}

/** Native codegen'd vector score over two `array<float>` columns.
  *
  * This is the engine's hot path: kNN scoring runs this once per
  * (row × query) pair, so it must stay inside whole-stage codegen. Spark's
  * higher-order functions (`zip_with`/`aggregate`) are `CodegenFallback` —
  * interpreted per row — which is why this is a custom `Expression`: the
  * generated code is a single static call into [[VectorMath]] with no
  * boxing and no per-element closure dispatch.
  */
case class VectorScore(left: Expression, right: Expression, kind: ScoreKind)
    extends BinaryExpression {

  // `ExpectsInputTypes`/`AbstractDataType` are private[sql]; callers (see
  // ScoreFunctions.score) cast to array<float>, and this check enforces it.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = s"vector_${kind.fnName}"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    kind match {
      case ScoreKind.L2 => VectorMath.l2(x, y)
      case ScoreKind.L1 => VectorMath.l1(x, y)
      case ScoreKind.Dot => VectorMath.dot(x, y)
      case ScoreKind.Cosine => VectorMath.cosine(x, y)
      case ScoreKind.Angular => VectorMath.angular(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.${kind.fnName}($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
