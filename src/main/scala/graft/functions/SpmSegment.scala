package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-token Viterbi segmentation kernel for the unigram-LM tokenizer
  * ([[graft.operators.Spm]]) — the [[BpeSegmentToken]] pattern: the
  * piece log-prob table rides the serialized expression, each token is
  * segmented in one DP walk (O(len × maxPieceLen) lookups), map-side,
  * whole-stage-codegen'd via a reference object.
  *
  * Decision rule (the total order shared with the DuckDB oracle's
  * `list_sort DESC` over `(score, −pieces, split)` structs and with the
  * independent driver segmenter [[graft.operators.Spm.segmentWord]]):
  * maximize summed log-prob, then fewer pieces, then the larger last
  * split point. Unknown SINGLE code points score
  * [[graft.operators.Spm.UnkLogProb]] (dyadic — oracle sums stay
  * bit-exact); unknown longer windows are not edges. */
object SpmSegment {

  final class Model(pieces: Array[(String, Double)], val maxPieceLen: Int)
      extends Serializable {
    @transient lazy val lp: java.util.HashMap[String, java.lang.Double] = {
      val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
      pieces.foreach { case (p, v) => m.put(p, v) }
      m
    }
  }

  def model(logProbs: Seq[(String, Double)], maxPieceLen: Int): Model = {
    require(maxPieceLen >= 1, s"maxPieceLen=$maxPieceLen")
    require(logProbs.nonEmpty, "empty piece table")
    new Model(logProbs.toArray, maxPieceLen)
  }

  def segment(tok: UTF8String, m: Model): GenericArrayData = {
    val w = tok.toString
    // code-point start offsets
    val starts = new Array[Int](w.length + 1)
    var ncp = 0
    var ci = 0
    while (ci < w.length) {
      starts(ncp) = ci
      ncp += 1
      ci += Character.charCount(w.codePointAt(ci))
    }
    starts(ncp) = w.length
    if (ncp == 0) return new GenericArrayData(Array.empty[Any])
    val NegInf = java.lang.Double.NEGATIVE_INFINITY
    val score = Array.fill(ncp + 1)(NegInf)
    val np = new Array[Int](ncp + 1)
    val back = new Array[Int](ncp + 1)
    score(0) = 0d
    var i = 1
    while (i <= ncp) {
      var j = math.max(0, i - m.maxPieceLen)
      while (j < i) {
        if (score(j) != NegInf) {
          val piece = w.substring(starts(j), starts(i))
          val v = m.lp.get(piece)
          val plp =
            if (v != null) v.doubleValue()
            else if (i - j == 1) graft.operators.Spm.UnkLogProb
            else java.lang.Double.NaN
          if (!java.lang.Double.isNaN(plp)) {
            val s = score(j) + plp
            val cand = np(j) + 1
            if (s > score(i) ||
                (s == score(i) && (cand < np(i) ||
                  (cand == np(i) && j >= back(i))))) {
              score(i) = s; np(i) = cand; back(i) = j
            }
          }
        }
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](np(ncp))
    var k = ncp
    var slot = np(ncp) - 1
    while (k > 0) {
      out(slot) = UTF8String.fromString(w.substring(starts(back(k)), starts(k)))
      slot -= 1
      k = back(k)
    }
    new GenericArrayData(out)
  }
}

/** `spm_segment(token)` under a fixed piece table: the Viterbi piece
  * array of one token. */
case class SpmSegmentToken(child: Expression, model: SpmSegment.Model)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"spm_segment requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "spm_segment"

  override protected def nullSafeEval(s: Any): Any =
    SpmSegment.segment(s.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("spmModel", model,
      classOf[SpmSegment.Model].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SpmSegment.segment($c, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SpmSegmentToken {
  def apply(token: Column, logProbs: Seq[(String, Double)],
      maxPieceLen: Int): Column =
    Bridge.column(SpmSegmentToken(Bridge.expression(token),
      SpmSegment.model(logProbs, maxPieceLen)))
}
