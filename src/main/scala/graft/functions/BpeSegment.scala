package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass BPE segmenter kernel — the scale path of
  * [[graft.operators.Bpe.segmentTokens]]. The replace-chain spelling is
  * one codegen'd literal `replace` PER MERGE, so plan size and per-row
  * cost are O(merges): structurally capped at toy merge counts (a real
  * vocabulary is 32k–64k merges; whole-stage codegen falls back beyond
  * ~100 chained calls — VERDICT r9 #3). This expression walks each token
  * against a rank table instead: per-row cost O(symbols²) with O(1)
  * hash lookups, INDEPENDENT of merge count, and the merge list rides
  * the serialized expression once per stage (≈ a few MB at 64k merges),
  * the broadcast-model shape every bounded-model operator here uses.
  *
  * Semantics are EXACTLY the replace chain's, for ANY merge list — not
  * just training-produced ones. The chain applies merges strictly in
  * list order, each left-to-right non-overlapping, and never revisits an
  * earlier merge even if a later one recreates its pair. Between two
  * applied merges the state does not change, so the applied subsequence
  * obeys one rule: the next applied rank is the MINIMUM rank strictly
  * above the last applied rank whose pair is currently adjacent. The
  * kernel runs that rule directly (a rank watermark), giving
  * `kernel(list) == chain(list)` by construction — the
  * BpeKernelParitySpec differential property. For training-produced
  * lists this also equals classic priority-merge BPE apply (a pair over
  * a symbol minted at rank r can itself only be minted after r, so the
  * watermark never skips an applicable merge).
  *
  * Output format is bit-identical to the chain: each symbol wrapped as
  * `SymOpen + sym + SymClose`, concatenated — so [[graft.operators.Bpe
  * .bpeTokenCount]] and `segmentedText` post-processing work unchanged
  * on either path. Symbols are CODE POINTS (the `regexp_replace '(.)'`
  * granularity and the training granularity after the r9 fix). */
object BpeSegment {

  /** Rank table: pair key `a + "\u0001" + b` → ALL 1-based ranks the
    * pair holds in the list, ascending. A pair CAN appear twice
    * (training never emits duplicates, but arbitrary lists may), and a
    * duplicate can genuinely fire in the chain when its pair re-forms
    * after the first application — e.g. `[("ab","c"), ("a","b"),
    * ("ab","c")]` over "abc" — so the lookup must yield the smallest
    * rank above the current watermark, not one fixed rank. The
    * `"\u0001"` separator cannot occur inside a symbol (both apply
    * paths strip the three sentinel bytes from input text, so training
    * never mints a symbol containing them), making the flat key
    * unambiguous. */
  def rankTable(merges: Seq[(String, String)]): java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      val k = a + "\u0001" + b
      val prev = m.get(k)
      m.put(k, if (prev == null) Array(i + 1) else prev :+ (i + 1))
    }
    m
  }

  /** Smallest rank in ascending `rs` strictly above `w`, or
    * Integer.MAX_VALUE. Duplicate-pair lists are rare and short, so a
    * linear scan over the (almost always length-1) array is right. */
  private def firstAbove(rs: Array[Int], w: Int): Int = {
    var i = 0
    while (i < rs.length) {
      if (rs(i) > w) return rs(i)
      i += 1
    }
    Integer.MAX_VALUE
  }

  def segment(tok: UTF8String, ranks: java.util.HashMap[String, Array[Int]]): UTF8String = {
    val s = tok.toString
    // split into code points (the training / '(.)'-regex granularity)
    var syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      syms.add(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    // rank-watermark loop: apply the minimum-rank present pair above the
    // watermark, left-to-right non-overlapping, until nothing applies
    var watermark = 0
    var continue = syms.size() >= 2 && !ranks.isEmpty
    while (continue) {
      var best = Integer.MAX_VALUE
      var j = 0
      while (j < syms.size() - 1) {
        val rs = ranks.get(syms.get(j) + "\u0001" + syms.get(j + 1))
        if (rs != null) {
          val r = firstAbove(rs, watermark)
          if (r < best) best = r
        }
        j += 1
      }
      if (best == Integer.MAX_VALUE) continue = false
      else {
        watermark = best
        val out = new java.util.ArrayList[String](syms.size())
        var k = 0
        while (k < syms.size()) {
          if (k < syms.size() - 1) {
            val rs = ranks.get(syms.get(k) + "\u0001" + syms.get(k + 1))
            if (rs != null && java.util.Arrays.binarySearch(rs, best) >= 0) {
              out.add(syms.get(k) + syms.get(k + 1)); k += 2
            } else { out.add(syms.get(k)); k += 1 }
          } else { out.add(syms.get(k)); k += 1 }
        }
        syms = out
        if (syms.size() < 2) continue = false
      }
    }
    val sb = new java.lang.StringBuilder(s.length * 3)
    var m = 0
    while (m < syms.size()) {
      sb.append('\u0002').append(syms.get(m)).append('\u0003')
      m += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `bpe_segment_token(tok)` under a fixed merge list: the sentinel-
  * wrapped segmentation of ONE whitespace token. Used inside the
  * `transform` over [[graft.functions.TextAnalysis.tokens]] — the HOF
  * evaluates lambdas interpreted, so this is eval-based by design
  * (CodegenFallback); the replace chain inside the same HOF is equally
  * interpreted per element. */
case class BpeSegmentToken(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val ranks = BpeSegment.rankTable(merges)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_segment_token requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_segment_token"

  override protected def nullSafeEval(tok: Any): Any =
    BpeSegment.segment(tok.asInstanceOf[UTF8String], ranks)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeSegmentToken {
  def apply(tok: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeSegmentToken(Bridge.expression(tok), merges))
}
