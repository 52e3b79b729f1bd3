package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Scalar vector math shared by the interpreted `eval` path and generated
  * Java (whole-stage codegen emits static calls into this object — Scala
  * objects expose static forwarders, so `graft.functions.VectorMath.l2(a,b)`
  * is valid generated code).
  *
  * Semantics follow the reference exactly (see SURVEY.md §2.3):
  *  - l2 / l1 / dot: truncate to min(len) dims (data/util.go:28-53)
  *  - cosine: cross-terms over min(len), norms over each vector's own full
  *    length (equivalent to zero-padding, data/util.go:61-96); returns 0 when
  *    either norm is 0; clamped to [-1, 1]
  *  - angular: 1 - acos(cosine)/π — a similarity, higher is closer
  *    (data/util.go:56-58)
  *
  * Deviation from the reference (documented in SURVEY §7): accumulation is
  * in f64, not f32 — oracle comparisons use rounded values.
  */
object VectorMath {

  /** A null ELEMENT makes the score undefined: `ArrayData.getFloat` reads
    * a null slot as 0.0f silently, which would return a plausible-looking
    * WRONG score. NaN is the engine's established undefined-score channel
    * (every search path filters NaN before ranking), and DuckDB's list
    * functions return NULL for the same input — both engines exclude the
    * row rather than mis-rank it. The pre-scan is a bitmap test per
    * element on the unsafe format — cheap next to the float math. */
  private def undefined(a: ArrayData, b: ArrayData): Boolean = {
    var i = 0
    val na = a.numElements()
    while (i < na) { if (a.isNullAt(i)) return true; i += 1 }
    i = 0
    val nb = b.numElements()
    while (i < nb) { if (b.isNullAt(i)) return true; i += 1 }
    false
  }

  def l2(a: ArrayData, b: ArrayData): Double = {
    if (undefined(a, b)) return Double.NaN
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  def l1(a: ArrayData, b: ArrayData): Double = {
    if (undefined(a, b)) return Double.NaN
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble)
      i += 1
    }
    acc
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    if (undefined(a, b)) return Double.NaN
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    if (undefined(a, b)) return Double.NaN // angular inherits via acos(NaN)
    val la = a.numElements()
    val lb = b.numElements()
    val n = math.min(la, lb)
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    // tail of the longer vector only contributes to its own norm
    while (i < la) { val x = a.getFloat(i).toDouble; aa += x * x; i += 1 }
    while (i < lb) { val y = b.getFloat(i).toDouble; bb += y * y; i += 1 }
    if (aa == 0.0 || bb == 0.0) 0.0
    else {
      val s = ab / (math.sqrt(aa) * math.sqrt(bb))
      if (s > 1.0) 1.0 else if (s < -1.0) -1.0 else s
    }
  }

  def angular(a: ArrayData, b: ArrayData): Double =
    1.0 - math.acos(cosine(a, b)) / math.Pi
}
