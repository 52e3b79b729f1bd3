package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
}

/** `phrase_set_match(padded)` under a fixed padded-pattern list: true
  * iff any pattern occurs as a substring. Eval-based (CodegenFallback) —
  * the automaton state machine has no useful codegen spelling, and one
  * virtual call per row amortizes over O(len) matching work. */
case class PhraseSetMatchExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {

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

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PhraseSetMatchExpr {
  def apply(padded: Column, patterns: Seq[String]): Column =
    Bridge.column(PhraseSetMatchExpr(Bridge.expression(padded), patterns))
}
