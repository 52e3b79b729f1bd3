package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Map-side scoring kernel for [[graft.operators.LangId]] — the
  * [[DsirFeatures]]/[[BpeSegment]] pattern: the trained model (per-gram
  * per-class `ln(c+1)` tables + smoothing denominators) rides the
  * serialized expression to every executor, and each document is scored
  * in ONE pass — normalize, windowed code-point grams, distinct set,
  * hash-map lookups, 26-wide accumulate, rounded argmax — with no
  * explode, no join, no shuffle, no per-row Spark array allocation.
  *
  * The DataFrame spelling of the same math (gram explode + broadcast
  * join + sorted fold — [[graft.operators.LangId.scoreDocsExpanded]])
  * is the executable SPEC: LidKernelParitySpec pins row-identical
  * output on the fixture and a corpus sample. It is not the runtime
  * path — it measured 616 s / 52.5k docs at the r11 rehearsal (the
  * collect_list of (gram, 26-long array) structs dominates), while this
  * kernel walks the same documents in single-digit seconds.
  *
  * Determinism contract carried over: grams fold in UTF8String BINARY
  * order (== DuckDB's VARCHAR order — the oracle's `ORDER BY gram`),
  * `ln` is the same `java.lang.Math.log` the Spark `log` Column calls,
  * the final round replicates Spark's `round(x, 6)` (BigDecimal
  * HALF_UP), and ties break by class index (classes sorted). */
object LidKernel {

  /** The broadcastable model: `langs` sorted; `lp(gram)(l) = ln(c+1)`
    * for every capped-vocab gram (precomputed once, driver-side, with
    * the same `Math.log`); `denom(l) = ln(N_l + V)`. */
  final class Model(
      val langs: Array[String],
      terms: Array[(String, Array[Double])],
      val denoms: Array[Double],
      val nMax: Int) extends Serializable {
    @transient lazy val map: java.util.HashMap[UTF8String, Array[Double]] = {
      val m = new java.util.HashMap[UTF8String, Array[Double]](terms.length * 2)
      terms.foreach { case (g, lps) => m.put(UTF8String.fromString(g), lps) }
      m
    }
    @transient lazy val langsU8: Array[UTF8String] =
      langs.map(UTF8String.fromString)
  }

  def model(m: graft.operators.LangId.LidModel): Model = {
    val terms = m.terms.map { case (g, cs) =>
      (g, cs.map(c => Math.log(c.toDouble + 1d)))
    }.toArray
    val denoms = m.totals.map(t => Math.log((t + m.vocabSize).toDouble))
    new Model(m.langs.toArray, terms, denoms, m.nMax)
  }

  private val Und = UTF8String.fromString(
    graft.operators.LangId.Undetermined)

  /** [[graft.operators.LangId.normalize]] replayed imperatively: ASCII
    * case fold, `[ \t\n\x0B\f\r]+` runs to one space, trim, one space of
    * padding each side ('' stays ''). Works on chars — the ws class and
    * A–Z are all BMP, so UTF-16 walking is code-point-faithful here. */
  def normalize(s: UTF8String): String = {
    val in = s.toString
    val sb = new java.lang.StringBuilder(in.length + 2)
    var i = 0
    var pendingSpace = false
    sb.append(' ')
    while (i < in.length) {
      val c = in.charAt(i)
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      if (isWs) { if (sb.length() > 1) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      }
      i += 1
    }
    if (sb.length() == 1) "" else { sb.append(' '); sb.toString }
  }

  /** The sorted distinct char 1..nMax-gram set of the normalized text,
    * as UTF8Strings in binary order. Windows are CODE POINTS: gram
    * boundaries never split a surrogate pair. */
  def gramSet(s: UTF8String, nMax: Int): java.util.TreeSet[UTF8String] = {
    val out = new java.util.TreeSet[UTF8String]()
    val norm = normalize(s)
    if (norm.isEmpty) return out
    // code-point start offsets
    val starts = new java.util.ArrayList[Integer](norm.length + 1)
    var i = 0
    while (i < norm.length) {
      starts.add(i)
      i += Character.charCount(norm.codePointAt(i))
    }
    starts.add(norm.length)
    val ncp = starts.size() - 1
    var n = 1
    while (n <= nMax) {
      var p = 0
      while (p + n <= ncp) {
        out.add(UTF8String.fromString(
          norm.substring(starts.get(p), starts.get(p + n))))
        p += 1
      }
      n += 1
    }
    out
  }

  /** Distinct sorted grams as a Spark array (the [[LidGramsExpr]]
    * payload). */
  def grams(s: UTF8String, nMax: Int): GenericArrayData = {
    val set = gramSet(s, nMax)
    val arr = new Array[Any](set.size())
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Score one document: `(n_hit, lang_pred, lid_score)` — the
    * [[graft.operators.LangId.scoreDocs]] semantics in one walk. */
  def score(s: UTF8String, m: Model): InternalRow = {
    val L = m.langs.length
    val sums = new Array[Double](L)
    var hits = 0
    val it = gramSet(s, m.nMax).iterator()
    while (it.hasNext) {
      val lps = m.map.get(it.next())
      if (lps != null) {
        hits += 1
        var l = 0
        while (l < L) { sums(l) += lps(l); l += 1 }
      }
    }
    if (hits == 0) return InternalRow(0, Und, 0d)
    var bestL = 0
    var bestScore = Double.NegativeInfinity
    var l = 0
    while (l < L) {
      val sc = round6(sums(l) - hits * m.denoms(l))
      if (sc > bestScore) { bestScore = sc; bestL = l }
      l += 1
    }
    InternalRow(hits, m.langsU8(bestL), bestScore)
  }
}

/** `lid_grams(text)` — the kernel spelling of
  * [[graft.operators.LangId.docGrams]] (distinct sorted 1..nMax char
  * grams), one walk per row instead of a nested-HOF window stack. */
case class LidGramsExpr(child: Expression, nMax: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lid_grams requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "lid_grams"

  override protected def nullSafeEval(s: Any): Any =
    LidKernel.grams(s.asInstanceOf[UTF8String], nMax)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LidKernel.grams($c, $nMax)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LidGramsExpr {
  def apply(text: Column, nMax: Int): Column =
    Bridge.column(LidGramsExpr(Bridge.expression(text), nMax))
}

/** `lid_score(text)` under a fixed trained model: one struct
  * `(n_hit, lang_pred, lid_score)` per row, map-side. */
case class LidScoreExpr(child: Expression, model: LidKernel.Model)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lid_score requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_hit", IntegerType, nullable = false),
    StructField("lang_pred", StringType, nullable = false),
    StructField("lid_score", DoubleType, nullable = false)))
  override def prettyName: String = "lid_score"

  override protected def nullSafeEval(s: Any): Any =
    LidKernel.score(s.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("lidModel", model,
      classOf[LidKernel.Model].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LidKernel.score($c, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LidScoreExpr {
  def apply(text: Column, model: LidKernel.Model): Column =
    Bridge.column(LidScoreExpr(Bridge.expression(text), model))
}
