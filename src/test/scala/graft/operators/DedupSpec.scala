package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Dedup-family semantics: exact dedup, shingle edge cases, MinHash-LSH
  * recall/precision vs exact Jaccard, SimHash locality, cosine-LSH recall
  * vs brute force. */
class DedupSpec extends SparkTestBase {

  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // near-dup of 1
    (3L, "a completely different sentence about spark query engines at scale"),
    (4L, "a completely different sentence about spark query engines at scale"), // exact dup of 3
    (5L, "short doc"), // fewer tokens than shingle size
    (6L, "unrelated words entirely banana apple orange grape melon kiwi")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id and counts copies") {
    val r = Dedup.exact(docs, Seq("text"), "doc_id")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(r(3L) == 2L) // 3 and 4 merged, min id kept
    assert(r(1L) == 1L && r(2L) == 1L)
    assert(!r.contains(4L))
  }

  test("shingles: distinct word n-grams; short docs yield empty set") {
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(5L).isEmpty)
    assert(sh(1L).contains("the quick brown"))
    assert(sh(1L).distinct.length == sh(1L).length)
  }

  test("jaccardPairs finds near and exact dups above threshold, nothing else") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((3L, 4L)))
    assert(pairs.size == 2)
  }

  test("minhash-LSH: precision 1 (subset of exact pairs) and full recall here") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashNearDups(docs, "doc_id", "text", 3, bands = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"lsh=$lsh not subset of exact=$exact")
    assert(lsh == exact) // tiny corpus: banding should not lose these
  }

  test("minhash banding rejects a bands count that does not divide k") {
    val d = Seq((1L, "a b c d e f")).toDF("id", "text")
    // 16/5 would silently create a ragged 1-signature band that collides
    // on ANY shared min-hash — must fail loudly like cosineNearDupsLSH
    val e = intercept[IllegalArgumentException](
      Dedup.minhashNearDups(d, "id", "text", n = 3, bands = 5))
    assert(e.getMessage.contains("divide"))
  }

  test("simhash: near-dups are close in hamming distance, unrelated docs far") {
    val h = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(3L) == h(4L)) // identical text -> identical simhash
    assert(ham(h(1L), h(2L)) < ham(h(1L), h(6L)),
      s"near-dup ${ham(h(1L), h(2L))} should beat unrelated ${ham(h(1L), h(6L))}")
  }

  test("simhashPairsAuto: density probe projects output; loud refusal past cap") {
    import spark.implicits._
    // spread signatures: every doc its own distant sig -> density ~0
    val spread = (0 until 300)
      .map(i => (i.toLong, (0x9E3779B97F4A7C15L * (i + 1)) & ((1L << 60) - 1)))
      .toDF("doc_id", "simhash")
    val ok = Dedup.simhashPairsAuto(spread, "doc_id", "simhash",
      maxHamming = 2, knownRows = 300L, maxProjectedPairs = 1000L)
    assert(ok.count() >= 0L) // runs; tiny output
    // concentrated: ALL identical -> density 1 -> projected ~ C(n,2)
    val conc = (0 until 300).map(i => (i.toLong, 12345L))
      .toDF("doc_id", "simhash")
    val e = intercept[IllegalArgumentException](
      Dedup.simhashPairsAuto(conc, "doc_id", "simhash",
        maxHamming = 2, knownRows = 300L, maxProjectedPairs = 1000L))
    assert(e.getMessage.contains("concentrated"))
    // default cap = unlimited: the concentrated corpus still enumerates
    val all = Dedup.simhashPairsAuto(conc, "doc_id", "simhash",
      maxHamming = 2, knownRows = 300L)
    assert(all.count() === 300L * 299 / 2)
  }

  test("prefix-filtered jaccardPairs == naive full-index join on real docs") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val corpus = d.unionByName(d.filter($"doc_id" < 15)
      .select(($"doc_id" + 10000).as("doc_id"),
        concat($"text", lit(" extra token padding")).as("text")))
    // naive reference: full inverted-index self-join, no prefix filter
    val sh = corpus.select($"doc_id".as("id"),
      explode(Dedup.shingles($"text", 3)).as("sh"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val naive = sh.as("a").join(sh.as("b"), $"a.sh" === $"b.sh" && $"a.id" < $"b.id")
      .groupBy($"a.id".as("id_a"), $"b.id".as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select($"id".as("id_a"), $"sz".as("sz_a")), "id_a")
      .join(sizes.select($"id".as("id_b"), $"sz".as("sz_b")), "id_b")
      .withColumn("jaccard", round($"inter".cast("double") /
        ($"sz_a" + $"sz_b" - $"inter"), 6))
      .filter($"jaccard" >= 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val prefixed = Dedup.jaccardPairsPrefix(corpus, "doc_id", "text", 3, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(naive.nonEmpty)
    assert(prefixed == naive, s"prefix=${prefixed.size} naive=${naive.size}")
    val viaFlag = Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.5,
        prefixFilter = true)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaFlag == naive)
  }

  test("simhashKeyedKeep: refusal's named fix — keep-list without pair enumeration") {
    import spark.implicits._
    // widest-key block choice is pinned per distance
    assert(Dedup.simhashKeyedBlocks(4) == 7)   // C(7,4)=35, C(8,4)=70
    assert(Dedup.simhashKeyedBlocks(3) == 8)   // C(8,3)=56, C(9,3)=84
    assert(Dedup.simhashKeyedBlocks(1) == Dedup.SimHashBits)
    assert(Dedup.simhashKeyedBlocks(0) == Dedup.SimHashBits) // exact-key dedup
    // the concentrated corpus simhashPairsAuto refuses on: keyed keep
    // COMPLETES and collapses the identical signatures to the min id
    val conc = (0 until 300).map(i => (i.toLong, 12345L))
      .toDF("doc_id", "simhash")
    val kc = Dedup.simhashKeyedKeep(conc, "doc_id", "simhash", maxHamming = 2)
    assert(kc.filter($"keep").select("doc_id").as[Long].collect().toSeq == Seq(0L))
    assert(kc.filter(!$"keep" && $"rep" =!= 0L).count() == 0L)
    // real corpus at d=4: survivors are PAIRWISE hamming > 4 (the keep
    // contract), and every exact-signature group keeps exactly its min
    val withH = docs.select($"doc_id", Dedup.simhash($"text").as("simhash"))
    val keyed = Dedup.simhashKeyedKeep(withH, "doc_id", "simhash", maxHamming = 4)
    assert(keyed.count() == docs.count()) // one verdict row per doc
    val kept = keyed.filter($"keep")
      .select("doc_id", "simhash").as[(Long, Long)].collect()
    for (Seq((ia, ha), (ib, hb)) <- kept.toSeq.combinations(2))
      assert(java.lang.Long.bitCount(ha ^ hb) > 4,
        s"survivors $ia,$ib within hamming 4")
    // docs 3 and 4 share identical text (identical signature): same rep,
    // and the later id can never be the survivor
    val v = keyed.filter($"doc_id".isin(3L, 4L))
      .select("doc_id", "rep", "keep").as[(Long, Long, Boolean)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(v(3L)._1 == v(4L)._1)
    assert(!v(4L)._2)
  }

  test("simhashKeyedKeep rounds>1: greedy MIS — chain-dropped docs re-admitted") {
    import spark.implicits._
    val withH = docs.select($"doc_id", Dedup.simhash($"text").as("simhash"))
    val r1 = Dedup.simhashKeyedKeep(withH, "doc_id", "simhash", maxHamming = 4)
    val r5 = Dedup.simhashKeyedKeep(withH, "doc_id", "simhash", maxHamming = 4,
      rounds = 5)
    assert(r5.count() == docs.count())
    val kept1 = r1.filter($"keep").select("doc_id").as[Long].collect().toSet
    val kept5 = r5.filter($"keep").select("doc_id").as[Long].collect().toSet
    // round-1 survivors are pass-1 keeps in both rules: refinement only ADDS
    assert(kept1.subsetOf(kept5), s"lost round-1 survivors: ${kept1 -- kept5}")
    // refined survivors stay pairwise hamming > 4
    val sigs = r5.filter($"keep").select("doc_id", "simhash")
      .as[(Long, Long)].collect()
    for (Seq((ia, ha), (ib, hb)) <- sigs.toSeq.combinations(2))
      assert(java.lang.Long.bitCount(ha ^ hb) > 4, s"survivors $ia,$ib within 4")
    // at 5 rounds on this corpus the MIS converges: every dropped doc
    // names a KEPT representative it band-collides with
    val reps = r5.filter(!$"keep").select("rep").as[Option[Long]].collect()
    assert(reps.forall(_.isDefined), "unconverged NULL reps at 5 rounds")
    assert(reps.flatten.toSet.subsetOf(kept5), "a dropped doc's rep was dropped")
    // maximality on converged output: strictly more data retained than
    // single-pass keep-first whenever chains existed
    assert(kept5.size >= kept1.size)
  }

  test("codegen simhash == HOF executable spec, and stays in a codegen span") {
    val eq = docs.select(
      Dedup.simhash(col("text")).as("fast"),
      Dedup.simhashHof(col("text")).as("spec"))
    assert(eq.filter($"fast" =!= $"spec").count() == 0)
    // non-foldable input from range() so the expression can't constant-fold
    val df = spark.range(2)
      .select(concat(lit("doc "), col("id"), lit(" alpha beta gamma")).as("t"))
      .select(graft.functions.SimHash64(col("t")).as("h"))
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, s"no codegen span:\n${df.queryExecution.executedPlan}")
    assert(df.count() == 2)
  }

  test("simhashPairs pigeonhole join: recall 1 and precision 1 vs brute force") {
    val withH = docs.select($"doc_id", Dedup.simhash($"text").as("simhash"))
    val brute = withH.as("a").crossJoin(withH.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        Dedup.hamming($"a.simhash", $"b.simhash").cast("long").as("hamming"))
      .filter($"hamming" <= 20)
      .as[(Long, Long, Long)].collect().toSet
    val banded = Dedup.simhashPairs(withH, "doc_id", "simhash", maxHamming = 20)
      .as[(Long, Long, Long)].collect().toSet
    assert(brute.nonEmpty) // docs 3/4 are identical → hamming 0
    assert(banded == brute, s"banded=$banded brute=$brute")
  }

  test("maxShingleDf cap drops boilerplate-only pairs, keeps real overlap") {
    // every doc shares the same 6-token boilerplate header (hot shingles);
    // docs 1/2 additionally share real content
    val header = "terms of service apply to everything"
    val corpus = Seq(
      (1L, s"$header alpha beta gamma delta epsilon zeta eta"),
      (2L, s"$header alpha beta gamma delta epsilon zeta theta"),
      (3L, s"$header totally different content one two three four"),
      (4L, s"$header другой unrelated body five six seven eight")
    ).toDF("doc_id", "text")
    // uncapped: boilerplate shingles connect EVERY doc pair in the
    // inverted index (Σdf² explosion shape); some cross pairs may even
    // pass the threshold through shared header mass
    val uncapped = Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 2L)))
    // capped at df<=2: the 4-doc header shingles leave the universe, real
    // content overlap decides alone
    val capped = Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.3, maxShingleDf = 2L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L)), s"capped=$capped")
    // minhash verify stage honors the same cap: verified jaccard uses the
    // reduced universe (higher than the uncapped value for 1~2)
    val j = Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.3, maxShingleDf = 2L)
      .filter($"id_a" === 1L && $"id_b" === 2L).select("jaccard").as[Double].head
    val mh = Dedup.minhashNearDups(corpus, "doc_id", "text", 3, bands = 4,
        threshold = 0.3, maxShingleDf = 2L)
      .filter($"id_a" === 1L && $"id_b" === 2L).select("jaccard").as[Double].collect()
    assert(mh.isEmpty || mh.head == j) // when banding finds it, values agree
  }

  test("srpAutoParams: bits scale with n, bands with the recall target") {
    // r ≈ log2(n) − 1 keeps a band's random collisions ~linear in n; b
    // compensates the per-band recall p^r
    assert(Dedup.srpAutoParams(5000L, 0.95) == ((12, 8)))
    assert(Dedup.srpAutoParams(52500L, 0.95) == ((15, 11)))
    assert(Dedup.srpAutoParams(100L, 0.95)._1 == 6)
    // clamps: tiny corpora never go below 4 bits; looser thresholds
    // (lower agree-prob) need more bands, capped at 32
    assert(Dedup.srpAutoParams(10L, 0.95)._1 == 4)
    assert(Dedup.srpAutoParams(1000000L, 0.8)._2 <= 32)
    // exact duplicates collide at ANY sizing — sanity on the probability
    assert(Dedup.srpAgreeProb(1.0) == 1.0)
  }

  test("cosineNearDupsLSHAuto: planted near-dups recovered at the recall target") {
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val base = (0L until 2000L).map(i => (i, vec()))
    // 50 planted near-dups: tiny perturbation keeps cosine ≥ 0.95
    val planted = base.take(50).map { case (i, v) =>
      (i + 100000L, v.map(x => x + 0.02f * rnd.nextGaussian().toFloat))
    }
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val pairs = Dedup.cosineNearDupsLSHAuto(df, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val truePairs = Dedup.cosineNearDups(df, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(truePairs)) // precision 1 (exact verify)
    val recall = pairs.intersect(truePairs).size.toDouble / truePairs.size
    assert(recall >= 0.8, s"recall $recall over ${truePairs.size} true pairs")
  }

  test("multi-band cosine LSH: recall materially above single band near threshold") {
    val dim = 32
    val rnd = new scala.util.Random(13)
    def gauss() = Array.fill(dim)(rnd.nextGaussian().toFloat)
    def normalize(v: Array[Float]) = {
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    // 150 base vectors; each gets a perturbed twin at cos ≈ 0.95-0.99
    val base = (0 until 150).map(i => (i.toLong, normalize(gauss())))
    val twins = base.map { case (i, v) =>
      // unit-norm perturbation scaled to put cos(v, twin) ≈ 1/√(1+α²)
      // with α ∈ [0.20, 0.32] → cos ∈ [0.952, 0.980] (near-threshold band)
      val alpha = 0.20f + 0.12f * rnd.nextFloat()
      val w = normalize(gauss())
      (i + 10000L, normalize(v.zip(w).map { case (a, b) => a + alpha * b }))
    }
    val df = (base ++ twins).map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding")
    val brute = Dedup.cosineNearDups(df, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.size >= 50, s"need near-threshold pairs, got ${brute.size}")
    def recall(planes: Int, bands: Int): Double = {
      val got = Dedup.cosineNearDupsLSH(df, "vec_id", "embedding", 0.95,
          Dedup.hyperplanes(dim, planes), bands)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got.subsetOf(brute)) // precision 1 after exact verify
      got.size.toDouble / brute.size
    }
    val single = recall(8, 1)
    val multi = recall(32, 4)
    assert(multi >= 0.8, s"multi-band recall $multi")
    assert(multi > single + 0.15, s"multi $multi vs single $single not material")
  }

  test("cosineNearDups refuses inputs past maxRows (O(n²) guard) and honors the override") {
    val df = (0L until 10L).map(i => (i, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Dedup.cosineNearDups(df, "vec_id", "embedding", 0.95, maxRows = 5L))
    assert(e.getMessage.contains("O(n²)"))
    // explicit override runs the same rows without the gate tripping
    val out = Dedup.cosineNearDups(df, "vec_id", "embedding", 0.95, maxRows = 10L)
    assert(out.count() == 45L) // identical vectors: all C(10,2) pairs at cos 1
  }

  test("decontaminate drops train rows near-duplicating the eval set") {
    val train = docs // ids 1-6
    val eval = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again and again exactly"), // ~doc 1
      (102L, "an eval question about something else entirely unrelated to anything")
    ).toDF("doc_id", "text")
    val pairs = Dedup.crossJaccardPairs(train, eval, "doc_id", "text", 3, 0.5)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(pairs.map(_._1) == Set(1L, 2L)) // docs 1 and 2 overlap eval 101
    assert(pairs.forall(_._2 == 101L))
    val clean = Dedup.decontaminate(train, eval, "doc_id", "text", 3, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(3L, 4L, 5L, 6L))
  }

  test("ngramContamination plan: eval grams broadcast, no train-side pre-join shuffle") {
    // the 100-TB contract: train explodes into ONE scan joined against a
    // BROADCAST of the (tiny) eval gram set — a shuffled join here would
    // move the whole exploded train corpus
    val train = (1L to 50L).map(i => (i, s"doc $i " + (1 to 20).map(j => s"w$i$j").mkString(" ")))
      .toDF("doc_id", "text")
    val eval = Seq((100L, (1 to 14).map(i => s"e$i").mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.ngramContamination(train, eval, "doc_id", "text", n = 13)
    out.queryExecution.toRdd.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"eval side not broadcast:\n${plan.take(2000)}")
  }

  test("stripHotSpans plan: no Window anywhere (positions come from posexplode)") {
    val docs = (1L to 30L).map(i => (i, s"some body $i " + "shared footer text all over the place"))
      .toDF("doc_id", "text")
    val out = Dedup.stripHotSpans(docs, "doc_id", "text", n = 3, minDf = 5)
    out.queryExecution.toRdd.count()
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("ngramContamination catches a verbatim quote Jaccard-threshold misses") {
    // a long web page QUOTING an eval question verbatim: containment is
    // the right test — the quote is 13 consecutive shared tokens, but the
    // page's Jaccard vs the question is tiny (|A∩B| / |A∪B| with a huge A)
    val question = (1 to 14).map(i => s"eval$i").mkString(" ")
    val page = ((1 to 80).map(i => s"page$i") :+ question).mkString(" ")
    val train = Seq(
      (1L, page),
      (2L, (1 to 40).map(i => s"clean$i").mkString(" "))
    ).toDF("doc_id", "text")
    val eval = Seq((100L, question)).toDF("doc_id", "text")
    // Jaccard flavor at its usual threshold: misses the quote
    val jac = Dedup.crossJaccardPairs(train, eval, "doc_id", "text", 3, 0.8)
    assert(jac.isEmpty, "Jaccard 0.8 should not fire on a quote in a long page")
    // containment: doc 1 shares the question's two 13-grams, doc 2 nothing
    val hits = Dedup.ngramContamination(train, eval, "doc_id", "text", n = 13)
      .as[(Long, Long, Long)].collect().toSet
    assert(hits == Set((1L, 100L, 2L)), s"got $hits")
    val clean = Dedup.decontaminateExact(train, eval, "doc_id", "text", n = 13)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L))
    // minHits raises the bar past what doc 1 shares
    assert(Dedup.ngramContamination(train, eval, "doc_id", "text",
      n = 13, minHits = 3L).isEmpty)
    // the eval side BROADCASTS — a mis-dispatched large "eval" refuses
    // loudly instead of OOMing the driver (ADVICE r4), and the guard is a
    // bounded probe, not a full count
    val guard = intercept[IllegalArgumentException] {
      Dedup.ngramContamination(train, eval, "doc_id", "text", n = 13,
        maxEvalRows = 0L)
    }
    assert(guard.getMessage.contains("maxEvalRows"))
  }

  test("stripHotSpans removes shared footer tokens, keeps unique bodies") {
    val footer = "all rights reserved subscribe to our newsletter today" // 8 tokens
    val docs = Seq(
      (1L, s"unique body one about cats $footer"),
      (2L, s"another unique body about dogs entirely $footer"),
      (3L, footer), // all boilerplate → ''
      (4L, "no boilerplate here at all just body text")
    ).toDF("doc_id", "text")
    val out = Dedup.stripHotSpans(docs, "doc_id", "text", n = 5, minDf = 2)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "unique body one about cats")
    assert(out(2L) == "another unique body about dogs entirely")
    assert(out(3L) == "")
    assert(out(4L) == "no boilerplate here at all just body text")
    // overlapping hot windows merge into one stripped span: the FULL
    // footer disappears although only its internal 5-grams are hot —
    // junction grams (body+footer) have df 1 and never fire, yet the
    // union of hot windows still covers every footer token
    assert(!out(1L).contains("rights") && !out(1L).contains("newsletter"))
    // minDf above the corpus df (footer df = 3): nothing stripped
    val none = Dedup.stripHotSpans(docs, "doc_id", "text", n = 5, minDf = 4)
      .as[(Long, String)].collect().toMap
    assert(none(1L) == s"unique body one about cats $footer")
    // short docs (< n tokens) pass through untouched
    val short = Seq((9L, "tiny doc")).toDF("doc_id", "text")
    val s = Dedup.stripHotSpans(short, "doc_id", "text", n = 5, minDf = 2)
      .as[(Long, String)].collect().toMap
    assert(s(9L) == "tiny doc")
    // fidelity (VERDICT r4 #4): untouched docs pass through BYTE-identical
    // (casing, odd separators, boundary whitespace all kept); stripped
    // docs keep original casing and the separator runs between adjacent
    // surviving tokens
    val messy = Seq(
      (1L, s"Unique\tBody  One $footer"),
      (2L, s"Another Unique BODY Two $footer"),
      (3L, "  Untouched\tDoc with   odd Spacing  ")
    ).toDF("doc_id", "text")
    val m = Dedup.stripHotSpans(messy, "doc_id", "text", n = 5, minDf = 2)
      .as[(Long, String)].collect().toMap
    assert(m(1L) == "Unique\tBody  One", s"got '${m(1L)}'")
    assert(m(2L) == "Another Unique BODY Two", s"got '${m(2L)}'")
    assert(m(3L) == "  Untouched\tDoc with   odd Spacing  ", s"got '${m(3L)}'")
    // gram detection is case-insensitive: a re-CASED footer still strips
    val cased = Seq(
      (1L, s"body one $footer"),
      (2L, s"body two ${footer.toUpperCase}")
    ).toDF("doc_id", "text")
    val c = Dedup.stripHotSpans(cased, "doc_id", "text", n = 5, minDf = 2)
      .as[(Long, String)].collect().toMap
    assert(c(1L) == "body one" && c(2L) == "body two", s"got $c")
    // the operator REPLACES text; every other column passes through
    val wide = docs.withColumn("lang", lit("en")).withColumn("nt", length($"text"))
    val w = Dedup.stripHotSpans(wide, "doc_id", "text", n = 5, minDf = 2)
    assert(w.columns.toSet == Set("doc_id", "text", "lang", "nt"))
    assert(w.filter($"doc_id" === 3L).select("text", "lang")
      .as[(String, String)].head() == (("", "en")))
  }

  test("resolve: a cluster whose global minimum is absent from ids keeps ONE survivor") {
    // pairs span a wider universe than ids (e.g. purging one partition):
    // the old keep = (id == global-min) surfaced ZERO keep rows for the
    // cluster and purge() deleted every copy
    val pairs = Seq((0L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    val ids = Seq(5L, 6L, 9L).toDF("doc_id")
    for (gate <- Seq(Long.MaxValue, -1L)) { // driver AND distributed paths
      val r = Dedup.resolve(pairs, ids, "doc_id", maxDriverEdges = gate)
        .as[(Long, Long, Boolean)].collect().toSet
      assert(r == Set((5L, 5L, true), (6L, 5L, false), (9L, 9L, true)),
        s"gate=$gate: $r")
    }
  }

  test("resolve: duplicate id rows yield one row per distinct id on both paths") {
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val ids = Seq(1L, 1L, 2L, 3L, 3L).toDF("doc_id")
    for (gate <- Seq(Long.MaxValue, -1L)) {
      val n = Dedup.resolve(pairs, ids, "doc_id", maxDriverEdges = gate).count()
      assert(n == 3, s"gate=$gate rows=$n")
    }
  }

  test("simhashPairs rejects a hamming budget at or beyond the fingerprint width") {
    val d = Seq((1L, 7L)).toDF("id", "simhash")
    intercept[IllegalArgumentException](
      Dedup.simhashPairs(d, "id", "simhash", maxHamming = Dedup.SimHashBits))
    intercept[IllegalArgumentException](
      Dedup.simhashPairs(d, "id", "simhash", maxHamming = -1))
  }

  test("resolve: transitive pairs collapse to one component, singletons kept") {
    // chain 1~2, 2~7 (7 not paired with 1 directly) plus island 3~4
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 7L), (3L, 4L)).toDF("id_a", "id_b")
    val r = Dedup.resolve(pairs, ids, "doc_id")
      .select("doc_id", "canonical", "keep").as[(Long, Long, Boolean)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) == ((1L, true)))
    assert(r(2L) == ((1L, false)))
    assert(r(7L) == ((1L, false))) // needed >1 propagation round
    assert(r(3L) == ((3L, true)) && r(4L) == ((3L, false)))
    assert(r(5L) == ((5L, true)) && r(6L) == ((6L, true)))
  }

  test("resolve: long chain converges within maxIter via propagation rounds") {
    val n = 12
    val ids = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // maxDriverEdges = 0 forces the DISTRIBUTED propagation path (small
    // graphs otherwise take the driver union-find fast path)
    val r = Dedup.resolve(pairs, ids, "doc_id", maxIter = 20, maxDriverEdges = 0L)
      .select("canonical").distinct().as[Long].collect().toSeq
    assert(r == Seq(1L))
  }

  test("resolve: driver and distributed paths produce identical labelings") {
    val ids = (1L to 40L).toDF("doc_id")
    // mix of chains, islands and singletons
    val pairs = ((1L until 10L).map(i => (i, i + 1)) ++
      Seq((20L, 25L), (25L, 21L), (30L, 31L))).toDF("id_a", "id_b")
    def collectR(maxDriverEdges: Long) =
      Dedup.resolve(pairs, ids, "doc_id", maxDriverEdges = maxDriverEdges)
        .select("doc_id", "canonical", "keep").as[(Long, Long, Boolean)]
        .collect().toSet
    assert(collectR(1000000L) == collectR(0L))
  }

  test("cosine-LSH recall >= 0.8 vs brute force on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val withDups = e.unionByName(e.filter($"vec_id" < 20)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding"))
    val brute = Dedup.cosineNearDups(withDups, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val dim = e.select(size($"embedding")).head.getInt(0)
    val lsh = Dedup.cosineNearDupsLSH(withDups, "vec_id", "embedding", 0.95,
      Dedup.hyperplanes(dim, 8)).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute))
    assert(brute.nonEmpty)
    assert(lsh.size.toDouble / brute.size >= 0.8, s"recall ${lsh.size}/${brute.size}")
  }
}
