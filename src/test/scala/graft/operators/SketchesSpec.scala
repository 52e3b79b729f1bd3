package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Sketches]] — mergeable corpus profiles. The synthetic corpus has a
  * per-group vocabulary far past the sketch nominal sizes (estimate mode,
  * not the exact small-set mode), so the bands here are the real
  * guarantees: HLL/theta estimates inside their rsd envelopes against
  * exact distinct counts, KLL quantiles inside the rank-error band,
  * incremental update == one-shot refit, theta set algebra against exact
  * set ops, and the loud cross-lgK merge refusal. */
class SketchesSpec extends SparkTestBase {

  import spark.implicits._

  // ~12k docs across 3 groups; token ids overlap partially across groups
  // so set ops are non-trivial. Each doc: 8 tokens from a group-specific
  // band → ~40k distinct trigram shingles per group (estimate mode at
  // lgK 12).
  private lazy val docs: DataFrame = {
    val rows = for {
      g <- 0 until 3
      d <- 0 until 4000
    } yield {
      val base = g * 30000 + (d * 131) % 50000
      val toks = (0 until 8).map(i => s"w${base + i * 7}")
      (s"g$g", toks.mkString(" "))
    }
    rows.toDF("grp", "text").repartition(8).localCheckpoint()
  }

  private def exactDistinctGrams(df: DataFrame): Map[String, Long] =
    df.select(col("grp"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
      .select(col("grp"), Dedup.tokHash61(col("sh")).as("h"))
      .groupBy("grp").agg(countDistinct("h").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def estimates(profile: DataFrame): Map[String, (Long, Long)] =
    Sketches.profileStats(profile, "grp")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("distinct_grams_hll"),
          r.getAs[Long]("distinct_grams_theta"))).toMap

  test("estimates inside rsd envelopes against exact distinct") {
    val p = Sketches.corpusProfile(docs, "grp", "text",
      params = Sketches.Params(lgK = 12))
    val exact = exactDistinctGrams(docs)
    val est = estimates(p)
    exact.foreach { case (g, ex) =>
      assert(ex > 20000, s"fixture group $g not in estimate mode: $ex")
      val (hll, th) = est(g)
      // lgK 12: hll rsd ~1.6%, theta ~1.6%; 5σ slack
      assert(math.abs(hll - ex).toDouble / ex < 0.08, s"$g hll $hll vs $ex")
      assert(math.abs(th - ex).toDouble / ex < 0.08, s"$g theta $th vs $ex")
    }
  }

  test("incremental update == one-shot refit on every estimate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch").toString
    val batches = (0 to 2).map(i =>
      docs.filter(pmod(hash(col("text")), lit(3)) === i))
    assert(batches.map(_.count()).sum === docs.count(),
      "batches must partition the corpus")
    Sketches.profileSave(spark, dir,
      Sketches.corpusProfile(batches.head, "grp", "text"), "grp")
    batches.tail.foreach(b => Sketches.profileUpdate(spark, dir, b, "text"))
    val (updated, _, g) = Sketches.profileLoad(spark, dir)
    assert(g === "grp")
    val refit = Sketches.corpusProfile(docs, "grp", "text")
    val up = Sketches.profileStats(updated, "grp", Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val rf = Sketches.profileStats(refit, "grp", Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(up.keySet === rf.keySet)
    // counters must be exactly equal; sketch estimates within each
    // sketch's own union envelope: HLL union is register-max
    // (near-lossless, 1%); theta union re-samples at the union theta
    // (its own rsd applies — 4% ≈ 5σ at lgK 14); KLL quantiles here are
    // the constant 8 (1%)
    val bands = Seq(0.01, 0.04, 0.01, 0.01, 0.01)
    up.foreach { case (grp, u) =>
      val r = rf(grp)
      assert(u.take(2) === r.take(2), s"$grp counters drifted")
      u.drop(2).zip(r.drop(2)).zipWithIndex.foreach { case ((a, b), i) =>
        val (x, y) = (a.asInstanceOf[Long].toDouble, b.asInstanceOf[Long].toDouble)
        assert(math.abs(x - y) <= bands(i) * math.max(y, 1.0),
          s"$grp stat $i: update $x vs refit $y")
      }
    }
  }

  test("KLL quantiles inside the rank band of exact order statistics") {
    val p = Sketches.corpusProfile(docs, "grp", "text")
    val got = Sketches.profileStats(p, "grp", Seq(0.5))
      .select("grp", "len_p50").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // all docs have exactly 8 tokens — median must be exactly 8
    got.foreach { case (g, m) => assert(m === 8L, s"$g median $m") }
  }

  test("theta set algebra tracks exact set ops") {
    val p = Sketches.corpusProfile(docs, "grp", "text",
      params = Sketches.Params(lgK = 14))
    val grams = docs
      .select(col("grp"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
      .select(col("grp"), Dedup.tokHash61(col("sh")).as("h")).distinct()
      .localCheckpoint()
    def set(g: String) = grams.filter(col("grp") === g)
      .select("h").as[Long].collect().toSet
    val (s0, s1) = (set("g0"), set("g1"))
    val ops = Sketches.thetaSetOps(p, "grp", Seq(("g0", "g1"))).collect().head
    val interEx = (s0 & s1).size.toDouble
    val diffEx = (s0 -- s1).size.toDouble
    val unionEx = (s0 | s1).size.toDouble
    assert(interEx > 1000, s"fixture overlap too small to test: $interEx")
    assert(math.abs(ops.getAs[Long]("inter_est") - interEx) / interEx < 0.12,
      s"inter ${ops.getAs[Long]("inter_est")} vs $interEx")
    assert(math.abs(ops.getAs[Long]("diff_est") - diffEx) / diffEx < 0.12,
      s"diff ${ops.getAs[Long]("diff_est")} vs $diffEx")
    assert(math.abs(ops.getAs[Long]("union_est") - unionEx) / unionEx < 0.08,
      s"union ${ops.getAs[Long]("union_est")} vs $unionEx")
  }

  test("cross-lgK merge refuses loudly, never degrades silently") {
    val a = Sketches.corpusProfile(docs, "grp", "text",
      params = Sketches.Params(lgK = 14))
    val b = Sketches.corpusProfile(docs, "grp", "text",
      params = Sketches.Params(lgK = 10))
    val err = intercept[Exception] {
      Sketches.mergeProfiles(a, b, "grp").collect()
    }
    assert(err.getMessage != null)
  }

  test("merge is null-safe: group present on one side passes through") {
    val a = Sketches.corpusProfile(docs.filter(col("grp") =!= "g2"),
      "grp", "text")
    val b = Sketches.corpusProfile(docs.filter(col("grp") === "g2"),
      "grp", "text")
    val m = Sketches.mergeProfiles(a, b, "grp")
    val est = estimates(m)
    assert(est.keySet === Set("g0", "g1", "g2"))
    val full = estimates(Sketches.corpusProfile(docs, "grp", "text"))
    est.foreach { case (g, (h, _)) =>
      assert(math.abs(h - full(g)._1).toDouble / full(g)._1 < 0.01,
        s"$g merged $h vs full ${full(g)._1}")
    }
  }
}
