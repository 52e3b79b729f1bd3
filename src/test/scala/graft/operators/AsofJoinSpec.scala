package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** [[AsofJoin]] against a brute-force reference (join every candidate,
  * keep the extreme by (time, tieBreak)) — equality on random streams,
  * plus pinned edges: inclusive equal-time match, unmatched left rows,
  * tie-break among same-(key, time) right rows, tolerance nulling,
  * forward direction, multi-column keys. */
class AsofJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // (key, t µs, payload) streams with deliberate time collisions.
  private def streamGen(nKeys: Int, n: Int): Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(n, for {
      k <- Gen.choose(0L, nKeys - 1L)
      t <- Gen.choose(0L, 40L)  // small range → many exact-time collisions
      p <- Gen.choose(0L, 999L)
    } yield (k, t * 1000000L, p))

  private def toDf(rows: Seq[(Long, Long, Long)], payload: String): DataFrame =
    rows.zipWithIndex
      .map { case ((k, t, p), i) => (k, t, p, i.toLong) }
      .toDF("k", "t_us", payload, "rid")
      .withColumn("t", timestamp_micros(col("t_us"))).drop("t_us")

  /** Brute-force reference: all pairs, rank by (t, rid) extreme. */
  private def reference(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)], forward: Boolean,
      tolerance: Option[Long]): Map[(Long, Long, Long, Int), Option[Long]] = {
    // rid mirrors toDf's zipWithIndex
    val r = right.zipWithIndex
    left.zipWithIndex.map { case ((lk, lt, lp), li) =>
      val cands = r.filter { case ((rk, rt, _), _) =>
        rk == lk && (if (forward) rt >= lt else rt <= lt) &&
          tolerance.forall(tol => math.abs(lt - rt) <= tol)
      }
      val best = if (cands.isEmpty) None
      else {
        val byTime =
          if (forward) cands.minBy { case ((_, rt, _), rid) => (rt, -rid) }
          else cands.maxBy { case ((_, rt, _), rid) => (rt, rid) }
        Some(byTime._1._3)
      }
      (lk, lt, lp, li) -> best
    }.toMap
  }

  private def engine(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)], forward: Boolean,
      tolerance: Option[Long]): Map[(Long, Long, Long, Int), Option[Long]] = {
    val l = toDf(left, "lp")
    val r = toDf(right, "rp")
    val joined =
      if (forward) AsofJoin.forward(l, r, Seq("k"), "t", "t", Seq("rp"),
        tieBreak = Some("rid"), tolerance = tolerance)
      else AsofJoin.backward(l, r, Seq("k"), "t", "t", Seq("rp"),
        tieBreak = Some("rid"), tolerance = tolerance)
    joined.select(col("k"), unix_micros(col("t")).as("t"), col("lp"),
        col("rid"), col("r_rp"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3).toInt) ->
        (if (x.isNullAt(4)) None else Some(x.getLong(4))))
      .toMap
  }

  test("backward == brute force on random streams with time collisions") {
    for (seed <- 1 to 4) {
      val left = sample(streamGen(5, 60), seed)
      val right = sample(streamGen(5, 60), seed + 100)
      assert(engine(left, right, forward = false, None) ===
        reference(left, right, forward = false, None), s"seed $seed")
    }
  }

  test("forward == brute force on random streams") {
    for (seed <- 10 to 12) {
      val left = sample(streamGen(4, 50), seed)
      val right = sample(streamGen(4, 50), seed + 100)
      assert(engine(left, right, forward = true, None) ===
        reference(left, right, forward = true, None), s"seed $seed")
    }
  }

  test("tolerance nulls far matches on both directions") {
    for (seed <- 20 to 21; fwd <- Seq(false, true)) {
      val left = sample(streamGen(4, 40), seed)
      val right = sample(streamGen(4, 40), seed + 100)
      val tol = Some(5L * 1000000)
      assert(engine(left, right, fwd, tol) ===
        reference(left, right, fwd, tol), s"seed $seed fwd $fwd")
    }
  }

  test("pinned edges: inclusive equal time, no-match left, tie-break") {
    // right rows: two at t=10 (rid 0, 1 — rid 1 must win the tie), one
    // at t=30; left at t=10 matches inclusively, left at t=5 unmatched,
    // left key 9 has no right rows at all.
    val right = Seq((1L, 10000000L, 100L), (1L, 10000000L, 200L),
      (1L, 30000000L, 300L))
    val left = Seq((1L, 10000000L, 0L), (1L, 5000000L, 1L),
      (1L, 35000000L, 2L), (9L, 10000000L, 3L))
    val got = engine(left, right, forward = false, None)
    assert(got((1L, 10000000L, 0L, 0)) === Some(200L)) // inclusive + tie
    assert(got((1L, 5000000L, 1L, 1)) === None)        // before all rights
    assert(got((1L, 35000000L, 2L, 2)) === Some(300L))
    assert(got((9L, 10000000L, 3L, 3)) === None)       // key absent
  }

  test("multi-column keys and payload column prefix collision guard") {
    val l = Seq((1L, 2L, 1000000L, 7L)).toDF("k1", "k2", "t_us", "x")
      .withColumn("t", timestamp_micros(col("t_us"))).drop("t_us")
    val r = Seq((1L, 2L, 1000000L, 42L), (1L, 3L, 1000000L, 43L))
      .toDF("k1", "k2", "t_us", "v")
      .withColumn("t", timestamp_micros(col("t_us"))).drop("t_us")
    val out = AsofJoin.backward(l, r, Seq("k1", "k2"), "t", "t", Seq("v"))
      .select("r_v").as[Long].collect()
    assert(out.toSeq === Seq(42L))
    val clash = intercept[IllegalArgumentException] {
      AsofJoin.backward(l.withColumn("r_v", lit(1)), r,
        Seq("k1", "k2"), "t", "t", Seq("v"))
    }
    assert(clash.getMessage.contains("prefix"))
    // mixed-case collision is just as ambiguous — resolution is
    // case-insensitive; left R_V vs emitted r_v must also refuse
    val mixedClash = intercept[IllegalArgumentException] {
      AsofJoin.backward(l.withColumn("R_V", lit(1)), r,
        Seq("k1", "k2"), "t", "t", Seq("v"))
    }
    assert(mixedClash.getMessage.contains("prefix"))
  }

  test("plan shape: exactly one exchange, and it hashes the keys") {
    val l = toDf(sample(streamGen(3, 30), 7), "lp")
    val r = toDf(sample(streamGen(3, 30), 8), "rp")
    val plan = AsofJoin.backward(l, r, Seq("k"), "t", "t", Seq("rp"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"want ONE key exchange, got:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      s"as-of must not plan a join:\n$plan")
  }

  test("aggregate-after-asof on the keys reuses the window exchange") {
    val l = toDf(sample(streamGen(3, 30), 7), "lp")
    val r = toDf(sample(streamGen(3, 30), 8), "rp")
    val agg = AsofJoin.backward(l, r, Seq("k"), "t", "t", Seq("rp"))
      .groupBy("k").agg(count(lit(1)), sum("r_rp"))
    val plan = agg.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"the groupBy(k) must reuse the window's key exchange:\n$plan")
  }
}
