package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass kernel for [[graft.operators.Dedup.stripHotSpans]]'s
  * byte-fidelity rebuild: walk the ORIGINAL string once, tokenizing on
  * the engine's whitespace class, and emit the uncovered tokens — the
  * original separator run between ADJACENT kept tokens, a single space
  * where a stripped span sat between them, boundary whitespace trimmed.
  * Exactly the contract the StripSpansPropertySpec reference and the
  * DuckDB oracle replay.
  *
  * Exists because the HOF spelling (regexp_extract_all tokens +
  * separators + an `aggregate` stitch) runs interpreted and re-parses
  * the document several times — it tripled `dedup_strip_spans`' bench
  * time when the fidelity rebuild landed (BASELINE.md round 5). This is
  * one codegen'd static call per covered document. */
object SpanRebuild {

  private def isWs(c: Char): Boolean = // TextHash.WsClassChars, as chars
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** `cov` = 0-based indices of covered tokens (any order, dups fine). */
  def rebuild(text: UTF8String, cov: ArrayData): UTF8String = {
    val s = text.toString
    val covered = new java.util.HashSet[Integer](cov.numElements() * 2)
    var ci = 0
    while (ci < cov.numElements()) { covered.add(cov.getInt(ci)); ci += 1 }
    val sb = new java.lang.StringBuilder(s.length)
    val n = s.length
    var pos = 0
    var tok = 0
    var prevKeptEnd = -1 // char offset past the previous KEPT token
    var prevKeptIdx = -2 // its token index
    while (pos < n) {
      while (pos < n && isWs(s.charAt(pos))) pos += 1
      if (pos < n) {
        val start = pos
        while (pos < n && !isWs(s.charAt(pos))) pos += 1
        if (!covered.contains(tok)) {
          if (prevKeptIdx >= 0) {
            if (tok == prevKeptIdx + 1) sb.append(s, prevKeptEnd, start)
            else sb.append(' ')
          }
          sb.append(s, start, pos)
          prevKeptEnd = pos
          prevKeptIdx = tok
        }
        tok += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

case class StripSpansRebuild(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"strip_spans_rebuild requires (string, array<int>), got (${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "strip_spans_rebuild"

  override protected def nullSafeEval(text: Any, cov: Any): Any =
    SpanRebuild.rebuild(text.asInstanceOf[UTF8String], cov.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, c) => s"graft.functions.SpanRebuild.rebuild($t, $c)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object StripSpansRebuild {
  def apply(text: Column, cov: Column): Column =
    Bridge.column(StripSpansRebuild(Bridge.expression(text), Bridge.expression(cov)))
}
