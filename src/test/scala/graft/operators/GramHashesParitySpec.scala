package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** r13: [[Dedup.positionalGrams]] computes window hashes with the
  * [[graft.functions.GramHashKernel]] rolling walk;
  * [[Dedup.positionalGramsExpanded]] keeps the window-slice + join +
  * tokHash61 HOF spelling as the executable spec. Pins row-identical
  * (id, pos, h[, h2]) tables — including non-ASCII tokens (the poly
  * UTF-16 path), repeated grams, docs below/at/above the window size,
  * and both hash lanes. */
class GramHashesParitySpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a b c d e f g"),
    (2L, "a b c a b c a b"),             // repeated windows
    (3L, "one two"),                      // below n → no rows
    (4L, "x y z"),                         // exactly n (n=3) → one row
    (5L, "héllo wörld naïve café münchen straße"), // non-ASCII UTF-16 path
    (6L, "  padded   tokens  here four five "),
    (7L, "")
  ).toDF("doc_id", "text")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("kernel positional grams == HOF spec (one lane)") {
    for (n <- Seq(2, 3, 5)) {
      val k = rows(Dedup.positionalGramsParityProbe(corpus, "doc_id", "text", n,
        hash128 = false))
      val s = rows(Dedup.positionalGramsExpanded(corpus, "doc_id", "text", n,
        hash128 = false))
      assert(k == s, s"n=$n diverged: kernel=${k.size} spec=${s.size}")
      assert(k.nonEmpty)
    }
  }

  test("kernel positional grams == HOF spec (two lanes, hash128)") {
    val k = rows(Dedup.positionalGramsParityProbe(corpus, "doc_id", "text", 3,
      hash128 = true))
    val s = rows(Dedup.positionalGramsExpanded(corpus, "doc_id", "text", 3,
      hash128 = true))
    assert(k == s, s"hash128 diverged: kernel=${k.size} spec=${s.size}")
  }
}
