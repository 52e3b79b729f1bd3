package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[HardNegatives]] against a driver-side brute-force reference: label
  * exclusion, self exclusion, closest-positive (incl. the singleton-class
  * null), the semi-hard flag, tie determinism, triplet margin band, and
  * the broadcast-no-preshuffle plan shape. */
class HardNegativesSpec extends SparkTestBase {

  import spark.implicits._

  // 40 vectors in 2-d, 4 labels; label 9 has a single member (no positive)
  private lazy val rows: Seq[(Long, Seq[Float], Int)] =
    (0L until 39L).map { i =>
      (i, Seq((i % 13).toFloat, (i / 3).toFloat), (i % 4).toInt)
    } :+ (99L, Seq(100f, 100f), 9)

  private lazy val df = rows.toDF("vec_id", "embedding", "label")

  private def d(a: Seq[Float], b: Seq[Float]): Double =
    math.sqrt(a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum)

  test("mine == brute force, self and same-label excluded") {
    val anchors = Set(0L, 5L, 99L)
    val got = HardNegatives.mine(df, df.filter(col("vec_id").isin(anchors.toSeq: _*)),
        "vec_id", "embedding", "label", k = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        BigDecimal(r.getDouble(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        Option(r.get(4)).map(x =>
          BigDecimal(x.asInstanceOf[Double]).setScale(6, BigDecimal.RoundingMode.HALF_UP)),
        r.getBoolean(5))).toSet
    val want = anchors.flatMap { aid =>
      val (_, av, albl) = rows.find(_._1 == aid).get
      val cands = rows.filter(r => r._1 != aid)
      val dp = cands.filter(_._3 == albl).map(r => d(av, r._2))
        .sorted.headOption
      cands.filter(_._3 != albl)
        .map(r => (r._1, r._3, d(av, r._2)))
        .sortBy { case (nid, _, dist) => (dist, nid) }
        .take(4)
        .map { case (nid, nlbl, dist) =>
          (aid, nid, nlbl,
            BigDecimal(dist).setScale(6, BigDecimal.RoundingMode.HALF_UP),
            dp.map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP)),
            dp.exists(dist > _))
        }
    }
    assert(got === want)
    // the singleton-class anchor has no positive: closest_pos null,
    // semi_hard false on every row
    val lone = got.filter(_._1 == 99L)
    assert(lone.nonEmpty && lone.forall(r => r._5.isEmpty && !r._6))
  }

  test("triplets obey the margin band and reference exactly") {
    val anchors = df.filter(col("vec_id") < 3)
    val margin = 3.0
    val got = HardNegatives.triplets(df, anchors, "vec_id", "embedding",
        "label", k = 12, margin = margin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (0L until 3L).flatMap { aid =>
      val (_, av, albl) = rows.find(_._1 == aid).get
      val cands = rows.filter(_._1 != aid)
      val negs = cands.filter(_._3 != albl)
        .map(r => (r._1, d(av, r._2))).sortBy { case (nid, dist) => (dist, nid) }
        .take(12)
      for {
        (pid, dap) <- cands.filter(_._3 == albl).map(r => (r._1, d(av, r._2)))
        (nid, dan) <- negs
        if dap < dan && dan < dap + margin
      } yield (aid, pid, nid)
    }.toSet
    assert(got === want)
    assert(got.nonEmpty, "margin band empty — fixture is vacuous")
  }

  test("similarity kinds rank by highest score, band flips (cosine)") {
    import graft.functions.ScoreKind
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      // the engine's cosine: double accumulation, zero-pad, clamp
      val n = math.max(a.size, b.size)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (0 until n).foreach { i =>
        val x = if (i < a.size) a(i).toDouble else 0.0
        val y = if (i < b.size) b(i).toDouble else 0.0
        dot += x * y; na += x * x; nb += y * y
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else math.max(-1.0, math.min(1.0, dot / (math.sqrt(na) * math.sqrt(nb))))
    }
    val anchors = Set(1L, 5L)
    val got = HardNegatives.mine(df, df.filter(col("vec_id").isin(anchors.toSeq: _*)),
        "vec_id", "embedding", "label", k = 4, kind = ScoreKind.Cosine)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(3)).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        Option(r.get(4)).map(x =>
          BigDecimal(x.asInstanceOf[Double]).setScale(6, BigDecimal.RoundingMode.HALF_UP)),
        r.getBoolean(5))).toSet
    val want = anchors.flatMap { aid =>
      val (_, av, albl) = rows.find(_._1 == aid).get
      val cands = rows.filter(_._1 != aid)
      // closest positive = HIGHEST cosine same-label row
      val sp = cands.filter(_._3 == albl).map(r => cos(av, r._2))
        .sorted(Ordering[Double].reverse).headOption
      cands.filter(_._3 != albl)
        .map(r => (r._1, cos(av, r._2)))
        .sortBy { case (nid, sim) => (-sim, nid) } // highest similarity first
        .take(4)
        .map { case (nid, sim) =>
          (aid, nid,
            BigDecimal(sim).setScale(6, BigDecimal.RoundingMode.HALF_UP),
            sp.map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP)),
            sp.exists(sim < _)) // semi-hard: LESS similar than nearest positive
        }
    }
    assert(got === want)
    assert(got.exists(_._5), "no semi-hard row — fixture is vacuous")
    assert(got.exists(!_._5), "all rows semi-hard — band not exercised")
  }

  test("similarity triplets: band is s_ap > s_an > s_ap - margin (cosine)") {
    import graft.functions.ScoreKind
    val got = HardNegatives.triplets(df, df.filter(col("vec_id") < 3),
        "vec_id", "embedding", "label", k = 12, margin = 0.05,
        kind = ScoreKind.Cosine)
      .collect().map(r => (r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty, "margin band empty — fixture is vacuous")
    got.foreach { case (sap, san) =>
      assert(sap > san && san > sap - 0.05, s"($sap, $san) outside band")
    }
  }

  test("plan: anchors broadcast, no exchange below the top-k aggregate") {
    val plan = HardNegatives.mine(df, df.filter(col("vec_id") < 3),
        "vec_id", "embedding", "label", k = 4)
      .queryExecution.executedPlan
    val root = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val s = root.toString
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastExchange"),
      s"anchors not broadcast:\n$s")
    val shuffles = root.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(shuffles.size === 1,
      s"want exactly the anchor-groupBy exchange, got ${shuffles.size}:\n$s")
    assert(shuffles.head.child.toString.contains("Aggregate"),
      s"shuffle child should be the partial top-k aggregate:\n$s")
  }
}
