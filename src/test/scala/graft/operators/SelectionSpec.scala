package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** [[Selection]] — distributed exact order statistics — against the
  * local-sort reference, with `localLimit` forced to 1 so every branch
  * of the quantile-probe narrowing actually executes (at the default
  * limit a test-sized frame collects immediately): uniform data, heavy
  * tie mass straddling the rank, all-equal columns, and every rank of a
  * small frame. Plus the rewritten [[LanguageModel.perplexityKeep]]
  * against the old rank-cut spelling on the same inputs. */
class SelectionSpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def check(xs: Seq[Double], ks: Seq[Long]): Unit = {
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("id", "x")
    val sortedAsc = xs.sorted
    ks.foreach { k =>
      val lg = Selection.kthLargest(df, "x", k, localLimit = 1)
      val sm = Selection.kthSmallest(df, "x", k, localLimit = 1)
      assert(lg === sortedAsc(xs.length - k.toInt),
        s"kthLargest(k=$k) over n=${xs.length}")
      assert(sm === sortedAsc(k.toInt - 1),
        s"kthSmallest(k=$k) over n=${xs.length}")
    }
  }

  test("every rank of a small frame, distributed path forced") {
    val xs = Seq(3.0, -1.5, 3.0, 0.0, 7.25, -1.5, 3.0, 9.0)
    check(xs, (1L to xs.length.toLong).toSeq)
  }

  test("random frames: selection == local sort at probed ranks") {
    val gen = for {
      n <- Gen.choose(50, 400)
      xs <- Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6))
    } yield xs.map(_.toDouble)
    (1 to 6).foreach { seed =>
      val xs = sample(gen, seed)
      val n = xs.length.toLong
      check(xs, Seq(1L, n / 4 max 1, n / 2 max 1, n - 1 max 1, n))
    }
  }

  test("heavy tie mass straddling the rank terminates and is exact") {
    // 30% of rows share one value right where the rank cut falls
    val xs = (1 to 100).map(_.toDouble) ++ Seq.fill(60)(42.5) ++
      (200 to 260).map(_.toDouble)
    check(xs, Seq(80L, 120L, 160L, 200L))
    // all-equal column: every rank returns the value
    check(Seq.fill(50)(13.0), Seq(1L, 25L, 50L))
  }

  test("knownN skips nothing semantically; bad ranks fail loudly") {
    val df = (1 to 20).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    assert(Selection.kthLargest(df, "x", 5, localLimit = 1, knownN = 20L) === 16.0)
    intercept[IllegalArgumentException] {
      Selection.kthLargest(df, "x", 0)
    }
    intercept[IllegalArgumentException] {
      Selection.kthLargest(df, "x", 21, localLimit = 1)
    }
  }

  // ---------------------------------------- perplexityKeep through selection

  /** The r9 rank-cut spelling — the semantic reference the threshold
    * rewrite must reproduce row-for-row. */
  private def rankCutRef(scored: org.apache.spark.sql.DataFrame,
      idCol: String, keepFrac: Double): Set[Long] = {
    val n = scored.count()
    val keep = math.ceil(keepFrac * n).toLong.toInt
    scored.orderBy(desc("avg_logprob"), asc(idCol)).limit(keep)
      .select(idCol).collect().map(_.getLong(0)).toSet
  }

  private def scoredFrame(scores: Seq[Double]) =
    scores.zipWithIndex.map { case (s, i) => (i.toLong, 10, 3.0 * s, s) }
      .toDF("doc_id", "n_tok", "logprob", "avg_logprob")

  test("perplexityKeep == rank cut through the distributed path, ties included") {
    val gen = for {
      n <- Gen.choose(40, 250)
      xs <- Gen.listOfN(n, Gen.oneOf(
        Gen.chooseNum(-8.0, -1.0),
        Gen.oneOf(-3.0, -4.0, -5.0))) // mass ties across the cut
    } yield xs
    (1 to 6).foreach { seed =>
      val scores = sample(gen, seed)
      val df = scoredFrame(scores)
      Seq(0.3, 0.6, 0.9, 1.0).foreach { f =>
        val got = LanguageModel.perplexityKeep(df, "doc_id", f,
            localLimit = 1)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        assert(got === rankCutRef(df, "doc_id", f),
          s"seed=$seed keepFrac=$f")
      }
    }
  }

  test("perplexityKeep: degenerate all-equal scores fail loudly past the tie bound") {
    val df = scoredFrame(Seq.fill(40)(-2.5))
    // keepFrac 1.0 keeps everything without touching the boundary logic
    assert(LanguageModel.perplexityKeep(df, "doc_id", 1.0).count() === 40L)
    val e = intercept[IllegalArgumentException] {
      LanguageModel.perplexityKeep(df, "doc_id", 0.5, maxBoundaryTies = 10)
    }
    assert(e.getMessage.contains("share the boundary value"))
    // …but a tie mass UNDER the bound resolves by id exactly
    val got = LanguageModel.perplexityKeep(df, "doc_id", 0.5,
        maxBoundaryTies = 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === (0L until 20L).toSet)
  }

  test("topK == rank cut on a timestamp ordering column (the evict shape)") {
    // recency eviction orders by timestamp; the selection path casts to
    // double — micro-precision must survive the cast and the kept set
    // must equal the rank cut exactly, ties resolved by id
    val rows = (0 until 300).map { i =>
      val ts = new java.sql.Timestamp(1700000000000L + (i % 60) * 1000L)
      (i.toLong, ts, s"payload$i")
    }
    val df = rows.toDF("id", "recency", "payload")
    Seq(7L, 120L, 299L).foreach { keep =>
      val got = Selection.topK(df, "recency", "id", keep, localLimit = 1)
        .select("id").collect().map(_.getLong(0)).toSet
      val ref = df.orderBy(desc("recency"), asc("id")).limit(keep.toInt)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got === ref, s"keep=$keep")
    }
    // keep ≥ n keeps everything; keep 0 keeps nothing
    assert(Selection.topK(df, "recency", "id", 300L).count() === 300L)
    assert(Selection.topK(df, "recency", "id", 0L).count() === 0L)
  }

  test("evict dispatches to threshold selection past rankCutMax, same set") {
    val rows = (0 until 500).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + (i % 40) * 1000L))
    }
    val df = rows.toDF("id", "recency")
    val viaRank = Ingest.evict(df, targetN = 200, utilization = 0.8,
        "recency", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    val viaSel = Ingest.evict(df, targetN = 200, utilization = 0.8,
        "recency", "id", rankCutMax = 0L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(viaSel === viaRank)
    assert(viaSel.size === 160)
  }

  test("topFracByGroup == per-group rank cut, ties and round paths included") {
    val gen = for {
      nGroups <- Gen.choose(2, 6)
      rows <- Gen.listOfN(400, for {
        g <- Gen.choose(0, nGroups - 1)
        x <- Gen.oneOf(Gen.chooseNum(-50.0, 50.0),
          Gen.oneOf(-7.0, 0.0, 7.0)) // heavy collisions across the cuts
      } yield (g, x))
    } yield rows.zipWithIndex.map { case ((g, x), i) => (i.toLong, s"g$g", x) }
    (1 to 5).foreach { seed =>
      val rows = sample(gen, seed)
      val df = rows.toDF("id", "grp", "x")
      Seq(0.25, 0.6, 1.0).foreach { frac =>
        val ref = rows.groupBy(_._2).flatMap { case (_, rs) =>
          val keep = math.ceil(frac * rs.size).toInt
          rs.sortBy { case (id, _, x) => (-x, id) }.take(keep).map(_._1)
        }.toSet
        // forced multi-round narrowing AND the immediate local path
        Seq(4, 1 << 20).foreach { lim =>
          val got = Selection.topFracByGroup(df, "grp", "x", "id", frac,
              localTotalLimit = lim)
            .select("id").collect().map(_.getLong(0)).toSet
          assert(got === ref, s"seed=$seed frac=$frac lim=$lim " +
            s"missing=${(ref diff got).take(5)} extra=${(got diff ref).take(5)}")
        }
      }
    }
  }

  test("bucketByGroup == per-group rank buckets (CCNet head/middle/tail)") {
    val gen = for {
      rows <- Gen.listOfN(300, for {
        g <- Gen.choose(0, 3)
        x <- Gen.oneOf(Gen.chooseNum(-20.0, 20.0), Gen.oneOf(-3.0, 3.0))
      } yield (g, x))
    } yield rows.zipWithIndex.map { case ((g, x), i) => (i.toLong, s"g$g", x) }
    (1 to 4).foreach { seed =>
      val rows = sample(gen, seed)
      val df = rows.toDF("id", "grp", "x")
      val got = Selection.bucketByGroup(df, "grp", "x", "id",
          Seq(0.33, 0.67), Seq("head", "middle", "tail"))
        .select("id", "bucket").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val ref = rows.groupBy(_._2).flatMap { case (_, rs) =>
        val sorted = rs.sortBy { case (id, _, x) => (-x, id) }
        val k1 = math.ceil(0.33 * rs.size).toInt
        val k2 = math.ceil(0.67 * rs.size).toInt
        sorted.zipWithIndex.map { case ((id, _, _), i) =>
          id -> (if (i < k1) "head" else if (i < k2) "middle" else "tail")
        }
      }.toMap
      assert(got === ref, s"seed=$seed diff=${
        got.collect { case (k, v) if ref(k) != v => (k, v, ref(k)) }.take(5)}")
      assert(got.size === rows.size)
    }
    // bad configs fail loudly
    val df = Seq((0L, "g", 1.0)).toDF("id", "grp", "x")
    intercept[IllegalArgumentException](
      Selection.bucketByGroup(df, "grp", "x", "id", Seq(0.7, 0.3),
        Seq("a", "b", "c")))
    intercept[IllegalArgumentException](
      Selection.bucketByGroup(df, "grp", "x", "id", Seq(0.5), Seq("a")))
  }

  test("topFracByGroup loud contracts: group cap and degenerate ties") {
    val df = (0 until 50).map(i => (i.toLong, s"g${i % 20}", 1.0))
      .toDF("id", "grp", "x")
    val e = intercept[IllegalArgumentException] {
      Selection.topFracByGroup(df, "grp", "x", "id", 0.5, maxGroups = 10)
    }
    assert(e.getMessage.contains("maxGroups"))
    // all-equal scores: the tie cut still resolves exactly by id
    val one = (0 until 40).map(i => (i.toLong, s"g${i % 2}", 3.25))
      .toDF("id", "grp", "x")
    val got = Selection.topFracByGroup(one, "grp", "x", "id", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === (0 until 40).filter(i => i / 2 < 10).map(_.toLong).toSet)
    val e2 = intercept[IllegalArgumentException] {
      Selection.topFracByGroup(one, "grp", "x", "id", 0.5, maxBoundaryTies = 5)
    }
    assert(e2.getMessage.contains("boundary"))
  }

  test("perplexityKeep keeps passthrough columns and the full row shape") {
    val df = Seq((1L, "en", 5, -1.0, -0.2), (2L, "fr", 5, -2.0, -0.4),
        (3L, "en", 5, -3.0, -0.6), (4L, "de", 5, -4.0, -0.8))
      .toDF("doc_id", "lang", "n_tok", "logprob", "avg_logprob")
    val kept = LanguageModel.perplexityKeep(df, "doc_id", 0.5, localLimit = 1)
    assert(kept.columns.toSeq ===
      Seq("doc_id", "lang", "n_tok", "logprob", "avg_logprob"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L))
  }

  test("quantiles == local sort-rank (quantile_disc convention), dist path") {
    val rnd = new scala.util.Random(17)
    val xs = Seq.fill(997)(rnd.nextInt(200).toDouble)
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("id", "x").repartition(16)
    val sorted = xs.sorted
    val ps = Seq(0.0, 0.015625, 0.25, 0.5, 0.75, 0.984375, 1.0)
    // force the distributed narrowing path with a tiny localLimit via
    // kthSmallest equivalence, then check the batch helper itself
    val got = Selection.quantiles(df, "x", ps)
    got.foreach { case (p, v) =>
      val k = math.max(1L, math.ceil(p * 997).toLong)
      assert(v === sorted(k.toInt - 1), s"p=$p")
    }
    // nulls/NaN excluded, not rank-corrupting
    val withBad = df.unionByName(
      Seq((9999L, Double.NaN)).toDF("id", "x"))
      .unionByName(Seq((10000L, Option.empty[Double])).toDF("id", "x"))
    val got2 = Selection.quantiles(withBad, "x", Seq(0.5))
    assert(got2.head._2 === sorted(math.ceil(0.5 * 997).toInt - 1))
    // guards
    val e = intercept[IllegalArgumentException] {
      Selection.quantiles(df, "x", Seq(1.5))
    }
    assert(e.getMessage.contains("outside"))
    val e2 = intercept[IllegalArgumentException] {
      Selection.quantiles(df.limit(0), "x", Seq(0.5))
    }
    assert(e2.getMessage.contains("no non-null rows"))
  }

  test("quantilesByGroup == per-group local sort-rank, uneven groups") {
    val rnd = new scala.util.Random(23)
    // uneven group sizes incl. a singleton; duplicate values for ties
    val rows = (0 until 1200).map { i =>
      val g = if (i == 0) "solo" else if (i % 3 == 0) "a" else "b"
      (i.toLong, g, rnd.nextInt(50).toDouble)
    }
    val df = rows.toDF("id", "grp", "x").repartition(16)
    val ps = Seq(0.0, 0.25, 0.5, 0.984375, 1.0)
    val got = Selection.quantilesByGroup(df, "grp", "x", ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val byG = rows.groupBy(_._2).view.mapValues(_.map(_._3).sorted).toMap
    for ((g, xs) <- byG; p <- ps) {
      val k = math.max(1L, math.ceil(p * xs.size).toLong).toInt
      assert(got((g, p)) === xs(k - 1), s"g=$g p=$p")
    }
    assert(got.size === byG.size * ps.size)
    // forced distributed narrowing (tiny localTotalLimit) — same values
    val gotDist = Selection.quantilesByGroup(df, "grp", "x", Seq(0.5),
        localTotalLimit = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    byG.foreach { case (g, xs) =>
      val k = math.max(1L, math.ceil(0.5 * xs.size).toLong).toInt
      assert(gotDist(g) === xs(k - 1), s"dist g=$g")
    }
    val e = intercept[IllegalArgumentException] {
      Selection.quantilesByGroup(df, "grp", "x", Seq(0.5), maxGroups = 2)
    }
    assert(e.getMessage.contains("maxGroups"))
  }
}
