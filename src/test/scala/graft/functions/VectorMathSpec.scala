package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

/** E1-E5 scalar semantics (SURVEY.md §2.3), including the reference's edge
  * cases: unequal lengths (truncate for l2/l1/dot — data/util.go:28-53;
  * zero-pad for cosine — util.go:61-96), zero-norm guard, clamping.
  * Properties use seeded random vectors (deterministic). */
class VectorMathSpec extends AnyFunSuite {

  private def arr(xs: Float*): ArrayData = ArrayData.toArrayData(xs.toArray)
  private val eps = 1e-6

  test("l2 euclidean distance") {
    assert(VectorMath.l2(arr(0f, 0f), arr(3f, 4f)) === 5.0)
    assert(VectorMath.l2(arr(1f, 2f, 3f), arr(1f, 2f, 3f)) === 0.0)
  }

  test("l2/l1/dot truncate to min(len) dims (util.go:29,40-42)") {
    // extra dims of the longer vector are ignored
    assert(VectorMath.l2(arr(1f, 1f), arr(1f, 1f, 99f)) === 0.0)
    assert(VectorMath.l1(arr(1f, 1f), arr(2f, 3f, 99f)) === 3.0)
    assert(VectorMath.dot(arr(1f, 2f), arr(3f, 4f, 99f)) === 11.0)
  }

  test("l1 manhattan") {
    assert(VectorMath.l1(arr(1f, 2f), arr(4f, 6f)) === 7.0)
  }

  test("dot product") {
    assert(VectorMath.dot(arr(1f, 2f, 3f), arr(4f, 5f, 6f)) === 32.0)
  }

  test("cosine: parallel=1, antiparallel=-1, orthogonal=0") {
    assert(math.abs(VectorMath.cosine(arr(1f, 2f), arr(2f, 4f)) - 1.0) < eps)
    assert(math.abs(VectorMath.cosine(arr(1f, 0f), arr(-1f, 0f)) + 1.0) < eps)
    assert(math.abs(VectorMath.cosine(arr(1f, 0f), arr(0f, 1f))) < eps)
  }

  test("cosine zero-pads the short vector (util.go:61-96)") {
    // [1,0] vs [1,0,1]: dot=1, |a|=1, |b|=sqrt(2) → 1/sqrt(2)
    val got = VectorMath.cosine(arr(1f, 0f), arr(1f, 0f, 1f))
    assert(math.abs(got - 1.0 / math.sqrt(2)) < eps)
  }

  test("cosine zero-norm guard returns 0 (util.go:86-88)") {
    assert(VectorMath.cosine(arr(0f, 0f), arr(1f, 2f)) === 0.0)
    assert(VectorMath.cosine(arr(1f, 2f), arr(0f, 0f)) === 0.0)
    assert(VectorMath.cosine(arr(), arr()) === 0.0)
  }

  test("angular = 1 - acos(cos)/pi (util.go:56-58); identical vectors → 1") {
    assert(math.abs(VectorMath.angular(arr(1f, 2f), arr(1f, 2f)) - 1.0) < eps)
    assert(math.abs(VectorMath.angular(arr(1f, 0f), arr(0f, 1f)) - 0.5) < eps)
  }

  private def randomVecs(seed: Long, n: Int): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Array.fill(1 + rnd.nextInt(32))(rnd.nextFloat() * 2 - 1))
  }

  test("properties: symmetry, non-negativity, cosine in [-1,1]") {
    for {
      a <- randomVecs(42L, 50)
      b <- randomVecs(43L, 10)
    } {
      val (x, y) = (ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      assert(VectorMath.l2(x, y) >= 0.0)
      assert(VectorMath.l1(x, y) >= 0.0)
      assert(math.abs(VectorMath.l2(x, y) - VectorMath.l2(y, x)) < eps)
      assert(math.abs(VectorMath.l1(x, y) - VectorMath.l1(y, x)) < eps)
      assert(math.abs(VectorMath.dot(x, y) - VectorMath.dot(y, x)) < eps)
      val c = VectorMath.cosine(x, y)
      assert(c >= -1.0 && c <= 1.0)
      assert(math.abs(c - VectorMath.cosine(y, x)) < eps)
      val ang = VectorMath.angular(x, y)
      assert(ang >= 0.0 && ang <= 1.0)
    }
  }

  test("self-distance zero, self-cosine one (for non-zero vectors)") {
    for (a <- randomVecs(44L, 50)) {
      val x = ArrayData.toArrayData(a)
      assert(VectorMath.l2(x, x) === 0.0)
      assert(VectorMath.l1(x, x) === 0.0)
      if (a.exists(_ != 0f))
        assert(math.abs(VectorMath.cosine(x, x) - 1.0) < 1e-5)
    }
  }
}
