package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Domain-mixture sampling: rate derivation, deterministic Bernoulli keep,
  * exact token-budget quota. */
class MixtureSpec extends SparkTestBase {

  import spark.implicits._

  // 3 domains: a = 10 docs x 100 tok, b = 10 x 50, c = 4 x 25
  private def docs = (
    (0L until 10L).map(i => (i, "a", 100L)) ++
    (10L until 20L).map(i => (i, "b", 50L)) ++
    (20L until 24L).map(i => (i, "c", 25L))
  ).toDF("id", "dom", "nt")

  test("domainRates: proportional to weights, capped at 1, 0-weight excluded") {
    val rates = Mixture.domainRates(docs, "dom", "nt",
      Map("a" -> 1d, "b" -> 1d), budgetTokens = 500L)
    // targets: a=250/1000 tokens -> 0.25, b=250/500 -> 0.5; c unweighted -> 0
    assert(rates("a") == 0.25 && rates("b") == 0.5)
    assert(rates("c") == 0.0)
    val capped = Mixture.domainRates(docs, "dom", "nt",
      Map("c" -> 1d), budgetTokens = 10000L)
    assert(capped("c") == 1.0)
  }

  test("temperedWeights: T=1 identity, T>1 flattens, T<1 sharpens, zeros stay zero") {
    val w = Map("web" -> 8d, "code" -> 2d, "books" -> 0d)
    assert(Mixture.temperedWeights(w, 1d) == w)
    def share(m: Map[String, Double], d: String) = m(d) / m.values.sum
    // flattening raises the small domain's share, sharpening lowers it
    val flat = Mixture.temperedWeights(w, 4d)
    val sharp = Mixture.temperedWeights(w, 0.5)
    assert(share(flat, "code") > share(w, "code"))
    assert(share(sharp, "code") < share(w, "code"))
    // an excluded domain is never resurrected by flattening
    assert(flat("books") == 0d && sharp("books") == 0d)
    intercept[IllegalArgumentException](Mixture.temperedWeights(w, 0d))
    intercept[IllegalArgumentException](Mixture.temperedWeights(Map("a" -> -1d), 2d))
  }

  test("non-integral id column is rejected loudly (cast would null out silently)") {
    import spark.implicits._
    val df = Seq(("u-1", "web", 10L), ("u-2", "web", 20L)).toDF("id", "domain", "tokens")
    val e = intercept[IllegalArgumentException](
      Mixture.sampleByRate(df, "id", "domain", Map("web" -> 1.0)))
    assert(e.getMessage.contains("integral id"))
    intercept[IllegalArgumentException](
      Mixture.sampleToBudget(df, "id", "domain", "tokens", Map("web" -> 1.0), 100L))
    intercept[IllegalArgumentException](Packing.chunked(df, "id", "tokens", 16, 2))
    intercept[IllegalArgumentException](Packing.ffd(df, "id", "tokens", 16, 2))
  }

  test("sampleByRate: pure function of the row — rate 1 keeps all, 0 none") {
    val kept = Mixture.sampleByRate(docs, "id", "dom",
      Map("a" -> 1.0, "b" -> 0.0)) // c absent -> dropped by the join
    val ids = kept.select("id").as[Long].collect().toSet
    assert(ids == (0L until 10L).toSet)
    // deterministic: two runs agree exactly
    val again = Mixture.sampleByRate(docs, "id", "dom", Map("a" -> 0.5, "b" -> 0.5))
    assert(again.select("id").as[Long].collect().toSet ==
      Mixture.sampleByRate(docs, "id", "dom", Map("a" -> 0.5, "b" -> 0.5))
        .select("id").as[Long].collect().toSet)
  }

  test("empty domain set (all rows gated away) yields an empty sample, not a crash") {
    val empty = docs.filter(lit(false))
    assert(Mixture.domainTargets(Map.empty, 1000L).isEmpty)
    val rates = Mixture.domainRatesFromTotals(Map.empty, Map.empty, 1000L)
    assert(Mixture.sampleByRate(empty, "id", "dom", rates).count() == 0)
    assert(Mixture.sampleToBudget(empty, "id", "dom", "nt", Map.empty, 1000L).count() == 0)
  }

  test("scale contract: sampleByRate plan is scan + broadcast join, no shuffle") {
    val out = Mixture.sampleByRate(docs, "id", "dom", Map("a" -> 0.5, "b" -> 0.5))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
    val shuffles = plan.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(shuffles == 0, s"expected 0 shuffle Exchanges, plan:\n$plan")
  }

  test("sampleToBudget: two-phase quota == window reference, domains spanning partitions") {
    // one domain big enough to span several range partitions — the shape
    // where the old Window.partitionBy(domain) plan serialized through a
    // single task and the two-phase offsets must stitch slices correctly
    val big = (
      (0L until 500L).map(i => (i, "a", (i % 7) + 1)) ++
      (500L until 600L).map(i => (i, "b", 13L))
    ).toDF("id", "dom", "nt").repartition(7)
    val weights = Map("a" -> 3d, "b" -> 1d)
    val budget = 900L
    val out = Mixture.sampleToBudget(big, "id", "dom", "nt", weights, budget)
    // the executed plan of the result must carry no Window (the quota is
    // offsets + a local filter, not a per-domain running-sum window)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
    val ids = out.select("id").as[Long].collect().toSet
    // reference: the single-window spelling of the same contract
    val tgt = Mixture.domainTargets(weights, budget).toSeq.toDF("dom", "__target")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("dom")
      .orderBy(Mixture.idHash(col("id")), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ref = big.join(broadcast(tgt), Seq("dom"), "inner")
      .withColumn("__b", coalesce(sum(col("nt")).over(w), lit(0L)))
      .filter(col("__b") < col("__target"))
      .select("id").as[Long].collect().toSet
    assert(ids == ref)
    // pure function of the data: input layout and shuffle-partition count
    // move the range boundaries, not the kept set
    val relaid = Mixture.sampleToBudget(big.repartition(3), "id", "dom", "nt",
      weights, budget).select("id").as[Long].collect().toSet
    assert(relaid == ids)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      val narrow = Mixture.sampleToBudget(big, "id", "dom", "nt",
        weights, budget).select("id").as[Long].collect().toSet
      assert(narrow == ids)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("sampleToBudget == window reference on random corpora (property sweep)") {
    // the structured fixture above pins one shape; this sweeps seeded
    // random corpora (skewed domain sizes, zero-token rows, tiny budgets)
    // against an in-memory replay of the window contract
    val rnd = new scala.util.Random(31L)
    for (trial <- 1 to 4) {
      val nDomains = 1 + rnd.nextInt(4)
      val rows = (0 until (50 + rnd.nextInt(400))).map { i =>
        val d = s"d${rnd.nextInt(nDomains)}"
        (i.toLong, d, rnd.nextInt(20).toLong) // includes 0-token rows
      }
      val weights = (0 until nDomains).map(j => s"d$j" -> (1d + rnd.nextInt(3))).toMap
      val budget = 1L + rnd.nextInt(2000)
      val got = Mixture.sampleToBudget(rows.toDF("id", "dom", "nt"),
          "id", "dom", "nt", weights, budget)
        .select("id").as[Long].collect().toSet
      // reference: per domain, hash-then-id order, keep while the
      // EXCLUSIVE running sum is under target
      val targets = Mixture.domainTargets(weights, budget)
      def h(id: Long) = (Mixture.HashA * (id % Mixture.HashP) + Mixture.HashB) % Mixture.HashP
      val expect = rows.groupBy(_._2).flatMap { case (d, rs) =>
        val tgt = targets.getOrElse(d, 0d)
        var run = 0L
        rs.sortBy(r => (h(r._1), r._1)).flatMap { case (id, _, nt) =>
          val keep = run < tgt; run += nt
          if (keep) Some(id) else None
        }
      }.toSet
      assert(got == expect, s"trial $trial: ${(got diff expect).take(3)} / ${(expect diff got).take(3)}")
    }
  }

  test("repeatByRate: floor copies + fractional Bernoulli; r <= 1 == sampleByRate") {
    val df = (0L until 400L).map(i => (i, if (i % 2 == 0) "hot" else "cold", 10L))
      .toDF("id", "dom", "nt")
    val rates = Map("hot" -> 2.5, "cold" -> 0.4)
    val out = Mixture.repeatByRate(df, "id", "dom", rates)
    val copies = out.groupBy("id").count()
      .as[(Long, Long)].collect().toMap
    // hot rows: 2 or 3 copies (never fewer); cold rows: at most one
    val hotIds = (0L until 400L by 2).toSet
    hotIds.foreach { i => assert(Seq(2L, 3L).contains(copies.getOrElse(i, 0L)), s"hot $i") }
    val hot3 = hotIds.count(i => copies.getOrElse(i, 0L) == 3L)
    assert(hot3 > 40 && hot3 < 160, s"fractional half-epoch kept $hot3 of 200")
    // cold at r = 0.4: EXACTLY the sampleByRate kept set, copy = 0
    val coldKept = out.filter($"dom" === "cold")
    assert(coldKept.select("copy").as[Long].collect().forall(_ == 0L))
    val viaSample = Mixture.sampleByRate(
      df.filter($"dom" === "cold"), "id", "dom", Map("cold" -> 0.4))
      .select("id").as[Long].collect().toSet
    assert(coldKept.select("id").as[Long].collect().toSet == viaSample)
    // copy indexes are dense 0..n-1 per id
    out.groupBy("id").agg(collect_list($"copy").as("cs"))
      .as[(Long, Seq[Long])].collect()
      .foreach { case (i, cs) => assert(cs.sorted == (0L until cs.size.toLong), s"id $i") }
    // deterministic: a second run is identical
    val again = Mixture.repeatByRate(df, "id", "dom", rates)
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(again == copies)
  }

  test("repeatKey: repeats compose with the epoch shuffle (distinct dense positions)") {
    val df = (0L until 100L).map(i => (i, "hot", 5L)).toDF("id", "dom", "nt")
    val repeated = Mixture.repeatByRate(df, "id", "dom", Map("hot" -> 2.5))
      .withColumn("rk", Mixture.repeatKey(col("id"), col("copy"), maxCopies = 4))
    val n = repeated.count()
    val order = Sampling.deterministicOrderIndex(repeated, "rk")
    val pos = order.select("pos").as[Long].collect().sorted
    // every (id, copy) pair gets its own position; positions are 0..n-1
    assert(pos.length == n && pos.toSeq == (0L until n))
    // copies of one id land at UNRELATED positions (hash-ordered), not
    // adjacent slots: adjacent copies would mean the "epoch spread" claim
    // is false. With ~250 rows, at most a couple of adjacencies by chance.
    val byId = repeated.select("id", "rk").join(order, "rk")
      .select("id", "pos").as[(Long, Long)].collect()
      .groupBy(_._1).values.map(_.map(_._2).sorted)
    val adjacent = byId.count(ps => ps.length > 1 &&
      ps.sliding(2).exists(w => w(1) - w(0) == 1))
    assert(adjacent <= 5, s"$adjacent ids have adjacent copies")
    // guards fire loudly
    intercept[Exception] {
      repeated.withColumn("bad", Mixture.repeatKey(col("id"), lit(9L), 4))
        .collect()
    }
    // Long.MinValue must hit the range guard, not wrap: abs(Long.MinValue)
    // is negative under non-ANSI semantics, so an abs-based guard would
    // silently admit it (ADVICE r4)
    intercept[Exception] {
      Seq(Long.MinValue).toDF("id")
        .withColumn("bad", Mixture.repeatKey(col("id"), lit(0L), 4))
        .collect()
    }
    // id == Long.MaxValue / k must ALSO hit the guard: with k=4
    // (MaxValue % 4 == 3) it happens to be safe, so use k=3 where
    // MaxValue % 3 == 1 and copy=2 would wrap silently (ADVICE r5)
    intercept[Exception] {
      Seq(Long.MaxValue / 3).toDF("id")
        .withColumn("bad", Mixture.repeatKey(col("id"), lit(2L), 3))
        .collect()
    }
    // the largest SAFE id passes and composes without wrapping
    val safe = (Long.MaxValue - 2) / 3
    val ok = Seq(safe).toDF("id")
      .withColumn("rk", Mixture.repeatKey(col("id"), lit(2L), 3))
      .select("rk").as[Long].head()
    assert(ok == safe * 3 + 2 && ok > 0)
  }

  test("sampleToBudget: null tokens count 0 in BOTH quota passes") {
    // a null token must not crash pass 1's tuple encoder, and must spend
    // nothing from the budget (the window reference's sum() skipped it)
    val df = Seq(
      (1L, "web", Some(4L)), (2L, "web", None), (3L, "web", Some(4L)),
      (4L, "web", Some(4L)), (5L, "web", Some(4L))
    ).toDF("id", "dom", "nt")
    val out = Mixture.sampleToBudget(df, "id", "dom", "nt",
      Map("web" -> 1.0), budgetTokens = 8L)
    val kept = out.select("id").as[Long].collect().toSet
    // hash order decides WHICH ids; the null row is free, so the kept set
    // is: every row whose exclusive running sum (nulls = 0) is under 8 —
    // i.e. the first two PAYING rows plus any null row preceding the cut
    val hashOrder = df.select(col("id"), Mixture.idHash(col("id")).as("h"))
      .orderBy("h", "id").select("id").as[Long].collect()
    val toks = Map(1L -> 4L, 2L -> 0L, 3L -> 4L, 4L -> 4L, 5L -> 4L)
    var run = 0L
    val expect = hashOrder.filter { id =>
      val before = run; run += toks(id); before < 8L
    }.toSet
    assert(kept == expect, s"kept $kept expect $expect")
    assert(kept.size >= 2) // at least two paying rows fit an 8-token budget
  }

  test("sampleToBudget: non-integral token column is rejected loudly") {
    val df = Seq((1L, "web", 1.5), (2L, "web", 2.5)).toDF("id", "domain", "tokens")
    val e = intercept[IllegalArgumentException](
      Mixture.sampleToBudget(df, "id", "domain", "tokens", Map("web" -> 1.0), 100L))
    assert(e.getMessage.contains("integral"))
  }

  test("sampleToBudget: minimal hash-prefix crossing each domain target") {
    val out = Mixture.sampleToBudget(docs, "id", "dom", "nt",
      Map("a" -> 1d, "b" -> 1d), budgetTokens = 440L)
    // target per domain = 220 tokens
    val byDom = out.groupBy("dom").agg(sum("nt").as("t"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // a: 100-token docs -> kept tokens cross 220 at the 3rd doc
    assert(byDom("a") == ((300L, 3L)))
    // b: 50-token docs -> crosses 220 at the 5th
    assert(byDom("b") == ((250L, 5L)))
    assert(!byDom.contains("c"))
    // domain smaller than its target keeps everything
    val all = Mixture.sampleToBudget(docs, "id", "dom", "nt",
      Map("c" -> 1d), budgetTokens = 100000L)
    assert(all.select("id").as[Long].collect().toSet == (20L until 24L).toSet)
  }
}
