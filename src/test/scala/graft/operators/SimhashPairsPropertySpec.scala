package graft.operators

import graft.SparkTestBase

/** Random sweep for [[Dedup.simhashPairs]]' pigeonhole block join against
  * a brute-force hamming cross join: planted near pairs (random bit
  * flips at/around the budget), random fingerprints, several maxHamming
  * budgets. The join's first-agreeing-block dedup condition must yield
  * EXACTLY the brute pair set — recall 1 AND precision 1 — on every
  * shape, including pairs agreeing on several blocks and pairs at
  * exactly the budget. */
class SimhashPairsPropertySpec extends SparkTestBase {

  import spark.implicits._

  test("pigeonhole block join == brute-force hamming pairs, random fingerprints") {
    val rnd = new scala.util.Random(101L)
    val mask60 = (1L << Dedup.SimHashBits) - 1
    for (trial <- 1 to 3; maxHamming <- Seq(2, 4, 7)) {
      val nBase = 60 + rnd.nextInt(80)
      val base = (0 until nBase).map(_ => rnd.nextLong() & mask60)
      // planted neighbors: flip 0..maxHamming+2 random bits of a base row
      // (some inside the budget, some just past it)
      val planted = (0 until 40).map { i =>
        val src = base(rnd.nextInt(base.size))
        val flips = rnd.nextInt(maxHamming + 3)
        val flipped = (0 until flips).foldLeft(src) { (h, _) =>
          h ^ (1L << rnd.nextInt(Dedup.SimHashBits)) }
        flipped & mask60
      }
      val rows = (base ++ planted).zipWithIndex
        .map { case (h, i) => (i.toLong, h) }
      val df = rows.toDF("doc_id", "simhash")
      val brute = (for {
        (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) if d <= maxHamming
      } yield (ia, ib, d.toLong)).toSet
      // sweep block counts: the default B = d+1 (single-block keys), a
      // mid B, and the auto-sized dispatch — output must be B-invariant
      for (blocks <- Seq(0, maxHamming + 2,
          Dedup.simhashAutoBlocks(rows.size, maxHamming))) {
        val banded = Dedup.simhashPairs(df, "doc_id", "simhash", maxHamming,
            blocks = blocks)
          .as[(Long, Long, Long)].collect().toSet
        assert(banded == brute,
          s"trial $trial h<=$maxHamming B=$blocks: " +
            s"extra=${(banded diff brute).take(3)} missing=${(brute diff banded).take(3)}")
      }
    }
  }

  test("multi-block plan shape: shuffle-hash join on checkpointed keys, no dedup exchange") {
    // pins the scale claims of the combination join: the banded self-join
    // stays a ShuffledHashJoin (band keys have no useful sort order) over
    // the ONE materialized key table (both sides scan the checkpoint RDD,
    // never recompute the simhash upstream), and the first-agreeing-
    // combination dedup lives in the join condition — no aggregate or
    // dropDuplicates exchange over the candidate set
    val df = (0 until 200).map(i => (i.toLong, (i * 2654435761L) & ((1L << 60) - 1)))
      .toDF("doc_id", "simhash")
    val pairs = Dedup.simhashPairs(df, "doc_id", "simhash", maxHamming = 4,
      blocks = 6)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"not a shuffle-hash join:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin"), s"sort-merge crept in:\n${plan.take(3000)}")
    assert(!plan.contains("HashAggregate"),
      s"candidate dedup became an aggregate exchange:\n${plan.take(3000)}")
    assert("Scan ExistingRDD".r.findAllIn(plan).size == 2,
      s"expected both join sides to scan the one checkpoint:\n${plan.take(3000)}")
  }

  test("auto block sizing: bench scales keep the measured-good default, large n widens keys") {
    // measured (BASELINE.md round 6): at ≤52.5k docs the cost is
    // output-bound and B=d+1 is within noise of best — the dispatcher
    // must NOT widen there; past the calibrated crossover (~200k at
    // d=4) the n² random-collision term dominates and wider keys win
    assert(Dedup.simhashAutoBlocks(200L, 4) == 5)
    assert(Dedup.simhashAutoBlocks(52500L, 4) == 5)
    assert(Dedup.simhashAutoBlocks(500000L, 4) > 5)
    assert(Dedup.simhashAutoBlocks(10000000L, 4) > 5)
    // d=0 degenerates to the exact 60-bit key
    assert(Dedup.simhashAutoBlocks(1000000L, 0) == 1)
  }
}
