package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel: distinct word n-gram shingles of a (lowercased,
  * whitespace-tokenized) string, first-occurrence order. Semantics
  * identical to the HOF spelling
  * `array_distinct(transform(sequence, i -> concat_ws(slice(tokens...))))`
  * and to the DuckDB oracle's `DISTINCT unnest(list_transform(...))`. */
object TextShingles {

  def shingles(s: UTF8String, n: Int): ArrayData = {
    val toks = TextHash.tokenize(s)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray[AnyRef](new Array[AnyRef](seen.size())))
  }
}

/** Codegen'd shingle extraction. The HOF version cost ~0.7 ms/doc
  * interpreted (≈3.4 s per pass at sf0.1, evaluated once per use of the
  * inverted index); this is a single static call inside codegen. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(s: Any): Any =
    TextShingles.shingles(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextShingles.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  def apply(c: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(c), n))
}

/** Per-document n-gram repetition statistics in ONE pass over the doc —
  * no explode, no shuffle: each doc's gram frequencies fit in a hash map,
  * so the metric is a map-side kernel, not a distributed aggregation
  * (explode → groupBy is the shape for CORPUS-wide frequencies, not
  * per-doc ones; the first cut of `text_repetition` used it and paid two
  * string shuffles for nothing). Returns (top_cover, dup_occ, n_grams):
  * max over grams of count·charLen, total occurrences of repeated grams,
  * and the gram count — (0,0,0) below n tokens. */
object GramStats {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  def gramStats(s: UTF8String, n: Int): InternalRow = {
    val toks = TextHash.tokenize(s)
    val k = toks.length - n + 1
    if (k <= 0) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[String, Int](k * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < k) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      counts.merge(sb.toString, 1, (a, b) => a + b)
      i += 1
    }
    var topCover = 0L
    var dupOcc = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // codepoint count, not UTF-16 units: the engine's length(text)
      // denominator and the oracle's len(g) both count codepoints, and an
      // astral character would otherwise count twice
      val g = e.getKey
      val cover = e.getValue.toLong * g.codePointCount(0, g.length)
      if (cover > topCover) topCover = cover
      if (e.getValue > 1) dupOcc += e.getValue
    }
    new GenericInternalRow(Array[Any](topCover, dupOcc, k.toLong))
  }

  def apply(c: Column, n: Int): Column =
    Bridge.column(GramStatsExpr(Bridge.expression(c), n))
}

/** Codegen'd [[GramStats.gramStats]]. */
case class GramStatsExpr(child: Expression, n: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_stats requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("top_cover", LongType, nullable = false),
    StructField("dup_occ", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false)))
  override def prettyName: String = "gram_stats"

  override protected def nullSafeEval(s: Any): Any =
    GramStats.gramStats(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramStats.gramStats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
