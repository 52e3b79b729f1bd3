package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed n-gram feature kernels for DSIR-style data selection (Xie et
  * al., "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023 — public method): each document maps to a bag of word
  * unigrams + bigrams hashed into a fixed bucket space, and an importance
  * weight is the sum of per-bucket log-probability ratios between a
  * TARGET corpus model and the RAW corpus model.
  *
  * Cross-engine contract (the [[TextHash]] discipline):
  *  - tokens are [[TextHash.tokenize]] (lowercased, whitespace-split,
  *    empties dropped) — the ONE tokenizer every text kernel shares;
  *  - the gram sequence is POSITION-ORDERED: all unigrams left to right,
  *    then all bigrams (`"tok_i tok_{i+1}"`) left to right — so the
  *    per-document ratio sum folds in one defined order and the DuckDB
  *    oracle (`list(lr ORDER BY ord)` + `list_reduce` sum) replays the
  *    addends bit-for-bit;
  *  - a gram's bucket is `poly(gram, 31) mod buckets` — the same mult-31
  *    rolling hash (mod 1e9+7) the shingle/sample oracles already spell
  *    with `list_reduce(... (a,b) -> (a*31+b) % 1000000007)`. */
object DsirFeatures {

  /** Hash multiplier — matches the token-hash oracle spelling used by
    * the dedup/sampling families, so ONE DuckDB hash idiom serves all. */
  val GramMult = 31L

  /** Per-document gram bucket ids in position order (unigrams then
    * bigrams). Occurrences, NOT distinct — DSIR features are counts. */
  def gramBuckets(s: UTF8String, buckets: Int): ArrayData = {
    val toks = TextHash.tokenize(s)
    val n = toks.length
    val out = new Array[Any](if (n == 0) 0 else 2 * n - 1)
    var i = 0
    while (i < n) {
      out(i) = (TextHash.poly(toks(i), GramMult) % buckets).toInt
      i += 1
    }
    i = 0
    while (i < n - 1) {
      out(n + i) = (TextHash.poly(toks(i) + " " + toks(i + 1), GramMult) % buckets).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Dense hashed-TF count vector: gram-occurrence counts per bucket
    * (the classic hashing-trick vectorizer). INTEGER counts on purpose —
    * dot products and squared norms over them are exact integer sums,
    * ORDER-INDEPENDENT, so a cosine built from them is bit-replayable by
    * any engine (see [[HashedTfCosine]]). */
  def bucketCountsDense(s: UTF8String, dim: Int): Array[Int] = {
    val toks = TextHash.tokenize(s)
    val n = toks.length
    val out = new Array[Int](dim)
    var i = 0
    while (i < n) {
      out((TextHash.poly(toks(i), GramMult) % dim).toInt) += 1
      i += 1
    }
    i = 0
    while (i < n - 1) {
      out((TextHash.poly(toks(i) + " " + toks(i + 1), GramMult) % dim).toInt) += 1
      i += 1
    }
    out
  }

  /** Cosine between a document's hashed-TF counts and a fixed query
    * count vector: `dot / (sqrt(‖a‖²) · sqrt(‖q‖²))` with dot and both
    * squared norms exact longs — three correctly-rounded IEEE ops total,
    * so the value is identical in every engine regardless of summation
    * order. Zero-norm (no grams) returns 0. */
  def hashedCosine(s: UTF8String, q: Array[Int], qNorm2: Long): Double = {
    val c = bucketCountsDense(s, q.length)
    var dot = 0L
    var a2 = 0L
    var i = 0
    while (i < c.length) {
      val v = c(i).toLong
      dot += v * q(i)
      a2 += v * v
      i += 1
    }
    if (a2 == 0L || qNorm2 == 0L) 0.0
    else dot.toDouble / (math.sqrt(a2.toDouble) * math.sqrt(qNorm2.toDouble))
  }

  /** SPARSE hashed-TF counts: occupied buckets ascending, then their
    * counts, as ONE `array<int>` of length 2m (`[b₁…b_m, c₁…c_m]`) — a
    * document touches ~2·tokens buckets, so the stored row is ~35×
    * smaller than the dense vector at the default 8k dim (the layout
    * that makes encode-once viable at 100 TB). */
  def bucketCountsSparse(s: UTF8String, dim: Int): ArrayData = {
    val dense = bucketCountsDense(s, dim)
    var m = 0
    var i = 0
    while (i < dense.length) { if (dense(i) != 0) m += 1; i += 1 }
    val out = new Array[Int](2 * m)
    var j = 0
    i = 0
    while (i < dense.length) {
      if (dense(i) != 0) { out(j) = i; out(m + j) = dense(i); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[hashedCosine]] over STORED sparse counts (the encode-once probe
    * path — no tokenization, a scan of 2m ints per row). Bit-identical
    * to the fresh path by construction: the sums run over the same
    * integers, and integer addition has no order. */
  def hashedCosineStored(sparse: ArrayData, q: Array[Int], qNorm2: Long): Double = {
    val m = sparse.numElements() / 2
    var dot = 0L
    var a2 = 0L
    var i = 0
    while (i < m) {
      val v = sparse.getInt(m + i).toLong
      dot += v * q(sparse.getInt(i))
      a2 += v * v
      i += 1
    }
    if (a2 == 0L || qNorm2 == 0L) 0.0
    else dot.toDouble / (math.sqrt(a2.toDouble) * math.sqrt(qNorm2.toDouble))
  }

  /** Batch cosine: tokenize and count ONCE per document, then score all
    * queries off the one count vector — `array<double>` in query order. */
  def hashedCosineMulti(s: UTF8String, qs: Array[Array[Int]],
      qNorm2: Array[Long]): ArrayData = {
    val c = bucketCountsDense(s, if (qs.isEmpty) 2 else qs(0).length)
    var a2 = 0L
    var i = 0
    while (i < c.length) { val v = c(i).toLong; a2 += v * v; i += 1 }
    val out = new Array[Any](qs.length)
    var j = 0
    while (j < qs.length) {
      if (a2 == 0L || qNorm2(j) == 0L) out(j) = 0.0
      else {
        val q = qs(j)
        var dot = 0L
        i = 0
        while (i < c.length) { dot += c(i).toLong * q(i); i += 1 }
        out(j) = dot.toDouble / (math.sqrt(a2.toDouble) * math.sqrt(qNorm2(j).toDouble))
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Position-ordered fold of `ratios(bucket)` over the document's gram
    * sequence — double addition left to right from 0.0, exactly the
    * order the oracle's `list_reduce` replays. */
  def logWeight(s: UTF8String, ratios: Array[Double], buckets: Int): Double = {
    val toks = TextHash.tokenize(s)
    val n = toks.length
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += ratios((TextHash.poly(toks(i), GramMult) % buckets).toInt)
      i += 1
    }
    i = 0
    while (i < n - 1) {
      acc += ratios((TextHash.poly(toks(i) + " " + toks(i + 1), GramMult) % buckets).toInt)
      i += 1
    }
    acc
  }
}

/** Codegen'd gram-bucket extraction (`array<int>` in position order). */
case class DsirGramBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dsir_gram_buckets requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "dsir_gram_buckets"

  override protected def nullSafeEval(s: Any): Any =
    DsirFeatures.gramBuckets(s.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DsirFeatures.gramBuckets($c, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DsirGramBuckets {
  def apply(c: Column, buckets: Int): Column =
    Bridge.column(DsirGramBuckets(Bridge.expression(c), buckets))
}

/** Codegen'd per-document importance log-weight: the ratio table (one
  * double per bucket — 64 KB at the default 8k buckets) rides the
  * serialized expression once per stage, the broadcast-model shape every
  * bounded-model operator here uses ([[BpeSegmentToken]],
  * [[graft.operators.LanguageModel]] scoring). */
case class DsirLogWeight(child: Expression, ratios: Array[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dsir_log_weight requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dsir_log_weight"

  override protected def nullSafeEval(s: Any): Any =
    DsirFeatures.logWeight(s.asInstanceOf[UTF8String], ratios, ratios.length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirRatios", ratios, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DsirFeatures.logWeight($c, $ref, $ref.length)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DsirLogWeight {
  def apply(c: Column, ratios: Array[Double]): Column =
    Bridge.column(DsirLogWeight(Bridge.expression(c), ratios))
}

/** Codegen'd hashed-TF cosine against a fixed query count vector (the
  * embedding-free text-similarity kernel): one pass per document, no
  * intermediate vector column, the query counts riding the expression
  * (broadcast-model shape). `qNorm2` is derived once here so the per-row
  * loop does no recomputation. */
case class HashedTfCosine(child: Expression, q: Array[Int])
    extends UnaryExpression {

  private val qNorm2: Long = {
    var s = 0L
    var i = 0
    while (i < q.length) { s += q(i).toLong * q(i); i += 1 }
    s
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hashed_tf_cosine requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "hashed_tf_cosine"

  override protected def nullSafeEval(s: Any): Any =
    DsirFeatures.hashedCosine(s.asInstanceOf[UTF8String], q, qNorm2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedTfQuery", q, "int[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DsirFeatures.hashedCosine($c, $ref, ${qNorm2}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedTfCosine {
  def apply(c: Column, q: Array[Int]): Column =
    Bridge.column(HashedTfCosine(Bridge.expression(c), q))
}

/** Codegen'd SPARSE hashed-TF counts (`array<int>`, the
  * [[DsirFeatures.bucketCountsSparse]] layout) — the encode step of the
  * store-once/probe-often lifecycle. */
case class HashedTfCounts(child: Expression, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hashed_tf_counts requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hashed_tf_counts"

  override protected def nullSafeEval(s: Any): Any =
    DsirFeatures.bucketCountsSparse(s.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DsirFeatures.bucketCountsSparse($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedTfCounts {
  def apply(c: Column, dim: Int): Column =
    Bridge.column(HashedTfCounts(Bridge.expression(c), dim))
}

/** [[HashedTfCosine]] over a STORED sparse-counts column
  * ([[HashedTfCounts]] layout). */
case class HashedTfCosineStored(child: Expression, q: Array[Int])
    extends UnaryExpression {

  private val qNorm2: Long = {
    var s = 0L
    var i = 0
    while (i < q.length) { s += q(i).toLong * q(i); i += 1 }
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_tf_cosine_stored requires array<int>, got ${t.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "hashed_tf_cosine_stored"

  override protected def nullSafeEval(a: Any): Any =
    DsirFeatures.hashedCosineStored(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], q, qNorm2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedTfQuery", q, "int[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DsirFeatures.hashedCosineStored($c, $ref, ${qNorm2}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedTfCosineStored {
  def apply(c: Column, q: Array[Int]): Column =
    Bridge.column(HashedTfCosineStored(Bridge.expression(c), q))
}

/** Batch hashed-TF cosine (`array<double>` in query order): one
  * tokenize+count per document for the WHOLE query batch. */
case class HashedTfCosineMulti(child: Expression, qs: Array[Array[Int]])
    extends UnaryExpression {

  private val qNorm2: Array[Long] = qs.map { q =>
    var s = 0L
    var i = 0
    while (i < q.length) { s += q(i).toLong * q(i); i += 1 }
    s
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hashed_tf_cosine_multi requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hashed_tf_cosine_multi"

  override protected def nullSafeEval(s: Any): Any =
    DsirFeatures.hashedCosineMulti(s.asInstanceOf[UTF8String], qs, qNorm2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refQ = ctx.addReferenceObj("hashedTfQueries", qs, "int[][]")
    val refN = ctx.addReferenceObj("hashedTfQueryNorms", qNorm2, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DsirFeatures.hashedCosineMulti($c, $refQ, $refN)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedTfCosineMulti {
  def apply(c: Column, qs: Array[Array[Int]]): Column =
    Bridge.column(HashedTfCosineMulti(Bridge.expression(c), qs))
}
