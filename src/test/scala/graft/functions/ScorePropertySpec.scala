package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** ScalaCheck property coverage promised by SURVEY §5 test-plan item 1:
  * symmetry, range bounds, identity, triangle inequality, and
  * codegen-vs-HOF agreement for every score function — evaluated over
  * deterministic generated vector pairs (seeded, so the suite is
  * reproducible) in ONE Spark pass instead of a job per sample. */
class ScorePropertySpec extends SparkTestBase {

  import spark.implicits._

  private val vecGen: Gen[Seq[Float]] = for {
    len <- Gen.choose(0, 8)
    xs <- Gen.listOfN(len, Gen.chooseNum(-10f, 10f))
  } yield xs

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // 300 generated pairs + adversarial edges the generator rarely hits:
  // empty, zero-norm, identical, and length-mismatched vectors
  private val pairs: Seq[(Seq[Float], Seq[Float])] =
    sample(Gen.listOfN(300, Gen.zip(vecGen, vecGen)), 42L) ++ Seq(
      (Nil, Nil),
      (Seq(0f, 0f), Seq(1f, 2f)),
      (Seq(0f, 0f, 0f), Seq(0f, 0f, 0f)),
      (Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),
      (Seq(1f, 2f, 3f, 4f), Seq(1f, 2f)))

  test("properties: symmetry, bounds, identity, codegen==HOF (one pass)") {
    val df = (pairs ++ pairs.map(p => (p._1, p._1))) // add (a,a) identity rows
      .toDF("a", "b")
    val kinds = Seq(
      ("l2", ScoreKind.L2), ("l1", ScoreKind.L1), ("dot", ScoreKind.Dot),
      ("cos", ScoreKind.Cosine), ("ang", ScoreKind.Angular))
    val cols = kinds.flatMap { case (name, k) =>
      Seq(
        ScoreFunctions.score(k, $"a", $"b").as(name),
        ScoreFunctions.score(k, $"b", $"a").as(s"${name}_sym"),
        ScoreFunctions.hof(k, $"a", $"b").as(s"${name}_hof"))
    } :+ ($"a" === $"b").as("same")
    val rows = df.select(cols: _*).collect()
    rows.foreach { r =>
      kinds.map(_._1).zipWithIndex.foreach { case (name, i) =>
        val v = r.getDouble(3 * i)
        val sym = r.getDouble(3 * i + 1)
        val hof = r.getDouble(3 * i + 2)
        assert(math.abs(v - sym) < 1e-9, s"$name not symmetric: $v vs $sym")
        assert(math.abs(v - hof) < 1e-9, s"$name codegen $v != HOF $hof")
      }
      val (l2, l1, cos, ang) =
        (r.getDouble(0), r.getDouble(3), r.getDouble(9), r.getDouble(12))
      assert(l2 >= 0 && l1 >= 0, s"distances must be non-negative: $l2 $l1")
      assert(cos >= -1.0 && cos <= 1.0, s"cosine out of range: $cos")
      assert(ang >= 0.0 && ang <= 1.0, s"angular out of range: $ang")
      if (r.getBoolean(15)) { // identity rows
        assert(l2 === 0.0 && l1 === 0.0, s"self-distance must be 0: $l2 $l1")
      }
    }
  }

  test("property: L2 triangle inequality on equal-length triples") {
    val tripleGen = for {
      len <- Gen.choose(1, 8)
      mk = Gen.listOfN(len, Gen.chooseNum(-10f, 10f))
      a <- mk; b <- mk; c <- mk
    } yield (a: Seq[Float], b: Seq[Float], c: Seq[Float])
    val triples = sample(Gen.listOfN(200, tripleGen), 7L)
    val r = triples.toDF("a", "b", "c").select(
      ScoreFunctions.vectorDistance($"a", $"c").as("ac"),
      (ScoreFunctions.vectorDistance($"a", $"b") +
        ScoreFunctions.vectorDistance($"b", $"c")).as("detour"))
      .as[(Double, Double)].collect()
    r.foreach { case (ac, detour) =>
      assert(ac <= detour + 1e-6, s"triangle violated: $ac > $detour")
    }
  }
}
