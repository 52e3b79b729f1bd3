package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Product-quantization codebook: `m` subspaces of `subDim` dims, each
  * with `ksub` centroids. Vectors compress to `m` small codes (one byte
  * each at ksub ≤ 256) — the memory layout that lets a 100-TB embedding
  * corpus keep its ANN index in RAM (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011).
  *
  * `normalized` records whether the codebook was trained on L2-normalized
  * vectors — the precondition for using its squared-L2 ADC as a
  * cosine/angular shortlist (on the unit sphere L2² = 2 − 2·cos, monotone
  * in cosine). Encode and search must match it or fail loudly. */
final case class PqCodebook(m: Int, subDim: Int,
    centers: Array[Array[Array[Float]]],
    normalized: Boolean = false) extends Serializable {
  require(centers.length == m && centers.forall(_.forall(_.length == subDim)))
  def ksub: Int = centers.head.length
  def dim: Int = m * subDim
}

object PqKernel {

  /** Encode a vector: per subspace, the index of the nearest centroid.
    * Wrong-dimension input fails loudly — silently padding missing dims
    * with 0 would map malformed vectors to arbitrary codes. */
  def encode(vec: ArrayData, cb: PqCodebook): ArrayData = {
    val v = vec.toFloatArray()
    require(v.length == cb.dim,
      s"pq_encode: vector dim ${v.length} != codebook dim ${cb.dim}")
    val codes = new Array[Int](cb.m)
    var j = 0
    while (j < cb.m) {
      val cents = cb.centers(j)
      val off = j * cb.subDim
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var i = 0
        val n = math.min(cb.subDim, math.max(0, v.length - off))
        while (i < n) {
          val diff = v(off + i) - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** Asymmetric distance: Σ_j lut(j)(code_j) — the query's precomputed
    * per-subspace distance table applied to a row's codes. One array
    * lookup per subspace per row; no vector math in the scan.
    *
    * Mismatches fail loudly like [[encode]]: codes paired with a LUT of a
    * different `m` (silently summing the shorter would return
    * plausible-but-wrong distances) or codes outside the LUT's ksub range
    * (a stale codes table scored against a reloaded smaller codebook)
    * both name the cause instead of an opaque AIOOBE from codegen. */
  def adc(codes: ArrayData, lut: Array[Array[Double]]): Double = {
    val n = codes.numElements()
    if (n != lut.length)
      throw new IllegalArgumentException(
        s"pq_adc: $n codes vs LUT for ${lut.length} subspaces — codes table " +
          "and codebook disagree on m (stale index dir?)")
    var s = 0.0
    var j = 0
    while (j < n) {
      val c = codes.getInt(j)
      val row = lut(j)
      if (c < 0 || c >= row.length)
        throw new IllegalArgumentException(
          s"pq_adc: code $c at subspace $j out of range for ksub ${row.length} " +
            "— codes encoded with a different codebook?")
      s += row(c)
      j += 1
    }
    s
  }
}

/** Codegen'd PQ encoder (vector → m codes). The codebook rides along as a
  * codegen reference object, so the hot loop stays a single static call
  * inside whole-stage codegen. */
case class PqEncode(child: Expression, codebook: PqCodebook) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(v: Any): Any =
    PqKernel.encode(v.asInstanceOf[ArrayData], codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook,
      classOf[PqCodebook].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernel.encode($c, $cb)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  def apply(c: Column, cb: PqCodebook): Column =
    Bridge.column(PqEncode(Bridge.expression(c), cb))
}

/** Codegen'd asymmetric-distance scorer (codes → distance via the query's
  * lookup table). */
case class PqAdc(child: Expression, lut: Array[Array[Double]]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires array<int>, got ${t.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(codes: Any): Any =
    PqKernel.adc(codes.asInstanceOf[ArrayData], lut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("pqLut", lut, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernel.adc($c, $l)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqAdc {
  def apply(c: Column, lut: Array[Array[Double]]): Column =
    Bridge.column(PqAdc(Bridge.expression(c), lut))
}

/** Batch variant of [[PqAdc]]: one LUT per query, selected per row by a
  * dense query index column — the whole batch's tables ride along as ONE
  * codegen reference object (q × m × ksub doubles; driver-sized because
  * the query batch is broadcast-sized by contract), so a scan joined to
  * N queries still does one array lookup per subspace per (row, query). */
case class PqAdcMulti(left: Expression, right: Expression,
    luts: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_multi requires (array<int>, int), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_multi"

  override protected def nullSafeEval(codes: Any, qidx: Any): Any =
    PqKernel.adc(codes.asInstanceOf[ArrayData], luts(qidx.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("pqLuts", luts, "double[][][]")
    defineCodeGen(ctx, ev, (c, q) => s"graft.functions.PqKernel.adc($c, $l[$q])")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcMulti {
  def apply(codes: Column, qidx: Column, luts: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqAdcMulti(Bridge.expression(codes), Bridge.expression(qidx), luts))
}
