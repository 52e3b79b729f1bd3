package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Positional word-n-gram 61-bit hashes in ONE walk (r13, guide §4):
  * the HOF spelling (`transform(sequence(0, T−n), i =>
  * tokHash61(array_join(slice(tk, i+1, n), " ")))`) re-materializes
  * every window as a string and re-hashes it from scratch — O(T·n)
  * character work per document, interpreted, with two array/string
  * allocations per window. This kernel joins the tokens once, computes
  * modular prefix hashes per lane, and derives each window hash in O(1)
  * by the standard rolling identity
  * `H(i..j) = (pre[j] − pre[i]·p^(j−i)) mod M`
  * — O(T) total, allocation-free per window.
  *
  * EXACTNESS: [[TextHash.poly]]'s recurrence is
  * `h = (h·p + char) mod M` over UTF-16 chars (its ASCII byte fast path
  * is char-identical), and a window of tokens joined by single spaces
  * is a SUBSTRING of all tokens joined by single spaces — so the prefix
  * identity reproduces `poly` bit-for-bit on every input, including
  * non-ASCII (GramHashesParitySpec pins kernel == HOF, and every
  * substring/strip-spans oracle replays the same hashes in DuckDB).
  * Lanes: (31, 37<<30) is [[graft.operators.Dedup.tokHash61]]; the
  * optional second lane (41, 43<<30) is `tokHash61b` (hash128). */
object GramHashKernel {
  private val M = TextHash.Mod

  /** hashes(tokens, n): per window position p (0-based), lane hashes
    * `polyA + (polyB << 30)`. Returns array<long> (one lane) or
    * array<struct<h,h2>> (two lanes). */
  def hashes(tokens: ArrayData, n: Int, second: Boolean): GenericArrayData = {
    val t = tokens.numElements()
    val wins = t - n + 1
    if (wins <= 0) return new GenericArrayData(new Array[Any](0))
    // join once; record each token's char start in the joined string
    val starts = new Array[Int](t + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < t) {
      if (i > 0) sb.append(' ')
      starts(i) = sb.length()
      sb.append(tokens.getUTF8String(i).toString)
      i += 1
    }
    starts(t) = sb.length() + 1 // virtual start past the end
    val s = sb
    val len = s.length()
    // prefix hashes and powers per multiplier
    def lane(p: Long): (Array[Long], Array[Long]) = {
      val pre = new Array[Long](len + 1)
      val pow = new Array[Long](len + 1)
      pow(0) = 1L
      var k = 0
      while (k < len) {
        pre(k + 1) = (pre(k) * p + s.charAt(k)) % M
        pow(k + 1) = (pow(k) * p) % M
        k += 1
      }
      (pre, pow)
    }
    val (preA1, powA1) = lane(31L)
    val (preA2, powA2) = lane(37L)
    val (preB1, powB1) = if (second) lane(41L) else (null, null)
    val (preB2, powB2) = if (second) lane(43L) else (null, null)
    def window(pre: Array[Long], pow: Array[Long], a: Int, b: Int): Long = {
      val h = (pre(b) - (pre(a) * pow(b - a)) % M) % M
      if (h < 0) h + M else h
    }
    val out = new Array[Any](wins)
    var w = 0
    while (w < wins) {
      val a = starts(w)
      val b = starts(w + n) - 1 // window ends before the separator space
      val hA = window(preA1, powA1, a, b) + (window(preA2, powA2, a, b) << 30)
      if (second) {
        val hB = window(preB1, powB1, a, b) + (window(preB2, powB2, a, b) << 30)
        out(w) = InternalRow(hA, hB)
      } else out(w) = hA
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** `gram_hashes(tokens)`: window hashes of all n-token grams, in window
  * order — `posexplode` over it reproduces the (pos, h) positional-gram
  * table. */
case class GramHashesExpr(child: Expression, n: Int, second: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"gram_hashes: n=$n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType =
    if (second) ArrayType(StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))), containsNull = false)
    else ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override protected def nullSafeEval(arr: Any): Any =
    GramHashKernel.hashes(arr.asInstanceOf[ArrayData], n, second)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramHashKernel.hashes($c, $n, $second)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHashesExpr {
  def apply(tokens: Column, n: Int, second: Boolean): Column =
    Bridge.column(GramHashesExpr(Bridge.expression(tokens), n, second))
}
