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

/** Map-side Stupid-Backoff bigram scoring kernel for
  * [[graft.operators.LanguageModel.scoreDocs]] — the [[LidKernel]]
  * pattern (r13, guide §4 "eliminate non-codegen expressions in the hot
  * path"): the trained model (driver-bounded by vocabCap/bigramCap)
  * rides the serialized expression to every executor, and each document
  * is scored in ONE walk over its token array — no per-token struct
  * array, no explode, no three broadcast joins, no groupBy(id) exchange,
  * no sort_array + interpreted fold.
  *
  * The DataFrame spelling of the same math
  * ([[graft.operators.LanguageModel.scoreDocsExpanded]]) is the
  * executable SPEC: LmKernelParitySpec pins row-identical output
  * (bit-exact doubles) on corpora exercising every branch — in-vocab
  * bigram hit, backoff, OOV head/tail, a literal `<unk>` token, empty
  * and single-token docs.
  *
  * Determinism contract: `ln` is `java.lang.StrictMath.log` — the exact
  * function Spark's `log` Column codegen emits (`java.lang.StrictMath.`
  * in UnaryLogExpression's template; verified against the 4.1.2 jar) —
  * and per-token log-probabilities accumulate in position order from
  * 0.0, the same IEEE sequence as the spec's sort_array + fold. */
object LmKernel {

  /** The broadcastable model: unigram counts (vocab ∪ `<unk>`), nested
    * bigram counts, totals. Lookup maps build lazily per executor. */
  final class Model(
      uniTerms: Array[(String, Long)],
      biTerms: Array[(String, String, Long)],
      val totalTokens: Long,
      val unkCount: Long,
      val alpha: Double,
      unk: String) extends Serializable {
    @transient lazy val uniMap: java.util.HashMap[UTF8String, java.lang.Long] = {
      val m = new java.util.HashMap[UTF8String, java.lang.Long](uniTerms.length * 2)
      uniTerms.foreach { case (t, c) =>
        m.put(UTF8String.fromString(t), java.lang.Long.valueOf(c)) }
      m
    }
    @transient lazy val biMap
        : java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]] = {
      val m = new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]]()
      biTerms.foreach { case (w1, w2, c) =>
        val k1 = UTF8String.fromString(w1)
        var inner = m.get(k1)
        if (inner == null) {
          inner = new java.util.HashMap[UTF8String, java.lang.Long]()
          m.put(k1, inner)
        }
        inner.put(UTF8String.fromString(w2), java.lang.Long.valueOf(c))
      }
      m
    }
    @transient lazy val unkU8: UTF8String = UTF8String.fromString(unk)
  }

  def model(lm: graft.operators.LanguageModel.BigramLM): Model =
    new Model(lm.unigrams.toArray, lm.bigrams.toArray, lm.totalTokens,
      lm.unkCount, graft.operators.LanguageModel.Alpha,
      graft.operators.LanguageModel.Unk)

  /** Score one tokenized document: `(n_tok, logprob, avg_logprob)` —
    * the [[graft.operators.LanguageModel.scoreDocs]] semantics in one
    * walk. Branch-for-branch mirror of the spec's expressions:
    * position 1 scores `ln(cuc/N)`; later positions `ln(cb/cup)` when
    * the mapped bigram survives the caps, else `ln(α·(cuc/N))`; `cuc`/
    * `cup` are the LITERAL token's unigram count with the `<unk>` count
    * as fallback (the spec's `coalesce(__cc, unkCount)`); mapped tokens
    * fall to `<unk>` exactly when the literal unigram lookup misses. */
  def score(tokens: ArrayData, m: Model): InternalRow = {
    val n = tokens.numElements()
    if (n == 0) return InternalRow(0, 0d, 0d)
    val nD = m.totalTokens.toDouble
    var sum = 0d
    var prev: UTF8String = null
    var prevC: java.lang.Long = null
    var i = 0
    while (i < n) {
      val w = tokens.getUTF8String(i)
      val cc = m.uniMap.get(w)
      val cuc = (if (cc == null) m.unkCount else cc.longValue()).toDouble
      val lp =
        if (i == 0) StrictMath.log(cuc / nD)
        else {
          val mp = if (prevC == null) m.unkU8 else prev
          val mc = if (cc == null) m.unkU8 else w
          val inner = m.biMap.get(mp)
          val cb = if (inner == null) null else inner.get(mc)
          if (cb != null) {
            val cup = (if (prevC == null) m.unkCount else prevC.longValue()).toDouble
            StrictMath.log(cb.longValue().toDouble / cup)
          } else StrictMath.log(m.alpha * (cuc / nD))
        }
      sum += lp
      prev = w
      prevC = cc
      i += 1
    }
    InternalRow(n, sum, sum / n)
  }
}

/** `lm_score(tokens)` under a fixed trained bigram model: one struct
  * `(n_tok, logprob, avg_logprob)` per row, map-side. Child must be the
  * SAME token array the spec scores
  * ([[graft.functions.TextAnalysis.tokens]]), so tokenization parity is
  * inherited, not re-implemented. */
case class LmScoreExpr(child: Expression, model: LmKernel.Model)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lm_score requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("logprob", DoubleType, nullable = false),
    StructField("avg_logprob", DoubleType, nullable = false)))
  override def prettyName: String = "lm_score"

  override protected def nullSafeEval(arr: Any): Any =
    LmKernel.score(arr.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("lmModel", model,
      classOf[LmKernel.Model].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LmKernel.score($c, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LmScoreExpr {
  def apply(tokens: Column, model: LmKernel.Model): Column =
    Bridge.column(LmScoreExpr(Bridge.expression(tokens), model))
}
