package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Map-side Naive-Bayes log-odds scoring kernel for
  * [[graft.operators.QualityClassifier.scoreDocs]] — the [[LmKernel]]
  * sibling (r13, guide §4): per-vocab-term log-odds are CONSTANT under a
  * fixed model, so they precompute driver-side with the exact expression
  * arithmetic (`StrictMath.log`, the function Spark's `log` codegen
  * emits; same add/divide/subtract order) and each document scores in
  * one token walk — no struct transform, no explode, no broadcast join,
  * no groupBy(id) exchange. Unknown tokens contribute nothing (the
  * ignore-unknown contract). [[graft.operators.QualityClassifier
  * .scoreDocsExpanded]] keeps the DataFrame spelling as the executable
  * spec; NbKernelParitySpec pins bit-exact parity. */
object NbKernel {

  /** The broadcastable model: per-term precomputed log-odds. */
  final class Model(terms: Array[(String, Double)]) extends Serializable {
    @transient lazy val map: java.util.HashMap[UTF8String, java.lang.Double] = {
      val m = new java.util.HashMap[UTF8String, java.lang.Double](terms.length * 2)
      terms.foreach { case (t, lp) =>
        m.put(UTF8String.fromString(t), java.lang.Double.valueOf(lp)) }
      m
    }
  }

  def model(nb: graft.operators.QualityClassifier.NbModel): Model = {
    // the spec's expression tree, literal for literal: `v`/`ng`/`nb` are
    // integer literals cast to double, added once each side
    val v = nb.vocabSize.toDouble
    val ng = nb.goodTotal.toDouble
    val nbT = nb.badTotal.toDouble
    new Model(nb.terms.map { case (t, cg, cb) =>
      (t, StrictMath.log((cg.toDouble + 1d) / (ng + v)) -
        StrictMath.log((cb.toDouble + 1d) / (nbT + v)))
    }.toArray)
  }

  /** Score one tokenized document: `(n_hit, logodds, avg_logodds)` —
    * vocab hits fold in position order from 0.0, zero-hit docs score
    * (0, 0.0, 0.0). */
  def score(tokens: ArrayData, m: Model): InternalRow = {
    val n = tokens.numElements()
    var hits = 0
    var sum = 0d
    var i = 0
    while (i < n) {
      val lp = m.map.get(tokens.getUTF8String(i))
      if (lp != null) { hits += 1; sum += lp.doubleValue() }
      i += 1
    }
    InternalRow(hits, sum, if (hits > 0) sum / hits else 0d)
  }
}

/** `nb_score(tokens)` under a fixed trained NB model: one struct
  * `(n_hit, logodds, avg_logodds)` per row, map-side. Child must be
  * [[TextAnalysis.tokens]]' array so tokenization parity is inherited. */
case class NbScoreExpr(child: Expression, model: NbKernel.Model)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nb_score requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_hit", IntegerType, nullable = false),
    StructField("logodds", DoubleType, nullable = false),
    StructField("avg_logodds", DoubleType, nullable = false)))
  override def prettyName: String = "nb_score"

  override protected def nullSafeEval(arr: Any): Any =
    NbKernel.score(arr.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("nbModel", model,
      classOf[NbKernel.Model].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NbKernel.score($c, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NbScoreExpr {
  def apply(tokens: Column, model: NbKernel.Model): Column =
    Bridge.column(NbScoreExpr(Bridge.expression(tokens), model))
}
