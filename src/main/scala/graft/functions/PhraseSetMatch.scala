package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matcher — the scale path of
  * [[TextAnalysis.containsAnyPhrase]]. The or-tree spelling probes one
  * codegen'd `contains` PER PHRASE: per-row cost O(N·len) and, past a
  * few hundred phrases, an expression tree Catalyst spends real time
  * analyzing. This expression runs ONE Aho–Corasick automaton over the
  * padded token string instead — per-row cost O(len) with O(1) amortized
  * transitions, INDEPENDENT of phrase count; the automaton builds once
  * per executor from the phrase list riding the serialized expression
  * (the broadcast-model shape every bounded-model kernel here uses —
  * [[BpeSegmentToken]]'s rank table, the DSIR ratio table).
  *
  * Semantics are EXACTLY the or-tree's: true iff any padded pattern
  * `" phrase "` occurs as a substring of the input (the caller pads and
  * normalizes both sides, so token-boundary semantics are carried by the
  * spelling, not by this matcher) — PhraseSetMatchParitySpec pins
  * equality on randomized lists/corpora. Early-exits on the first hit. */
object PhraseSetMatch {

  /** Aho–Corasick over Java chars (the padded patterns and inputs are
    * whitespace-joined tokens; surrogate pairs pass through as two
    * transitions on both sides, so matching is byte-faithful). */
  final class Automaton(patterns: Array[String]) extends Serializable {
    private val next = new java.util.ArrayList[java.util.HashMap[Character, Integer]]()
    private val fail = new java.util.ArrayList[Integer]()
    private val term = new java.util.ArrayList[java.lang.Boolean]()
    next.add(new java.util.HashMap[Character, Integer]())
    fail.add(0); term.add(false)
    patterns.foreach { p =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        val t = next.get(s).get(c)
        if (t == null) {
          next.add(new java.util.HashMap[Character, Integer]())
          fail.add(0); term.add(false)
          next.get(s).put(c, next.size() - 1)
          s = next.size() - 1
        } else s = t
        i += 1
      }
      term.set(s, true)
    }
    // BFS fail links; terminal propagates through them (a pattern that is
    // a suffix of another path must still fire)
    locally {
      val q = new java.util.ArrayDeque[Integer]()
      next.get(0).forEach { (_, v) => fail.set(v, 0); q.add(v) }
      while (!q.isEmpty) {
        val u = q.poll()
        next.get(u).forEach { (c, v) =>
          var f = fail.get(u).intValue()
          while (f != 0 && next.get(f).get(c) == null) f = fail.get(f)
          val t = next.get(f).get(c)
          fail.set(v, if (t != null && t != v) t.intValue() else 0)
          if (term.get(fail.get(v))) term.set(v, true)
          q.add(v)
        }
      }
    }

    def matches(s: String): Boolean = {
      var st = 0
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        var cur = st
        var nx = -1
        while (nx < 0) {
          val t = next.get(cur).get(c)
          if (t != null) nx = t.intValue()
          else if (cur == 0) nx = 0
          else cur = fail.get(cur)
        }
        st = nx
        if (term.get(st)) return true
        i += 1
      }
      false
    }
  }

  /** The padded token-string rebuild
    * `' ' || array_join(tokens(text), ' ') || ' '` in one walk —
    * byte-identical to the HOF spelling (Unicode lowercase, whitespace
    * runs collapsed, leading/trailing dropped, single-space joins, one
    * pad space each side; an all-whitespace/empty doc yields `"  "`).
    * Exists because the HOF spelling (`filter`/`split` lambdas) is
    * CodegenFallback and evicted the WHOLE phrase-gate stage from
    * whole-stage codegen. */
  def paddedTokens(s: UTF8String): UTF8String = {
    val in = s.toLowerCase.toString
    val sb = new java.lang.StringBuilder(in.length + 2)
    sb.append(' ')
    var pending = false
    var i = 0
    while (i < in.length) {
      val c = in.charAt(i)
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      if (isWs) { if (sb.length() > 1) pending = true }
      else {
        if (pending) { sb.append(' '); pending = false }
        sb.append(c)
      }
      i += 1
    }
    sb.append(' ')
    UTF8String.fromString(sb.toString)
  }
}

/** `padded_tokens(text)` — codegen'd [[PhraseSetMatch.paddedTokens]]. */
case class PaddedTokensExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"padded_tokens requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "padded_tokens"

  override protected def nullSafeEval(s: Any): Any =
    PhraseSetMatch.paddedTokens(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PhraseSetMatch.paddedTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PaddedTokensExpr {
  def apply(text: Column): Column =
    Bridge.column(PaddedTokensExpr(Bridge.expression(text)))
}

/** `phrase_set_match(padded)` under a fixed padded-pattern list: true
  * iff any pattern occurs as a substring. The automaton walk itself has
  * no useful inline-codegen spelling (it is a data-driven state machine),
  * but the expression still participates in WHOLE-STAGE CODEGEN: the
  * built automaton rides the generated class as a reference object and
  * the emitted code is one virtual call per row, which amortizes over
  * O(len) matching work. The r10 `CodegenFallback` spelling disabled
  * WSCG for the ENTIRE enclosing stage (`CollapseCodegenStages` rejects
  * any plan containing a fallback expression), de-optimizing every
  * co-resident filter/projection of a curation pass — the gate now keeps
  * its stage fused. */
case class PhraseSetMatchExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val ac =
    new PhraseSetMatch.Automaton(patterns.toArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"phrase_set_match requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "phrase_set_match"

  override protected def nullSafeEval(s: Any): Any =
    ac.matches(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the automaton (built once on the driver from the pattern list)
    // ships to executors inside the generated class's references array —
    // the broadcast-model shape, emitted as one virtual call per row
    val acRef = ctx.addReferenceObj("phraseAc", ac,
      classOf[PhraseSetMatch.Automaton].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.matches($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PhraseSetMatchExpr {
  def apply(padded: Column, patterns: Seq[String]): Column =
    Bridge.column(PhraseSetMatchExpr(Bridge.expression(padded), patterns))
}
