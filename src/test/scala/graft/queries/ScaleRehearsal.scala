package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Dedup, Search, SearchConfig}

/** Scale rehearsal at ~sf1 (VERDICT r4 #8): deterministic synthetic
  * corpora 10× the bench SF — 50k documents / 50k 64-dim embeddings
  * (plus a 20k-doc Zipf-boilerplate corpus for the uncapped inverted
  * plan, whose Σ df² cost grows QUADRATICALLY with corpus size and is
  * exactly what this rehearsal must expose) — run through the dedup and
  * ANN families with per-stage wall timing. Results are recorded in
  * BASELINE.md round 5. Dev-only main:
  * sbt "Test/runMain graft.queries.ScaleRehearsal"
  * Data generates once into /tmp/graft_sf1 (seeded, layout-stable). */
object ScaleRehearsal {

  private val Dir = "/tmp/graft_sf1"
  private val NDocs = 50000
  private val NSkewDocs = 20000
  private val NVecs = 50000
  private val Dim = 64

  private def gen(spark: SparkSession): Unit = {
    import spark.implicits._
    if (new java.io.File(s"$Dir/_done").exists()) return
    // documents: ~100 tokens from a 20k-word vocab, Zipf-ish via modular
    // hashing; 5% planted near-dups (id+10000000, 3 extra tokens)
    def docText(id: Long): String = {
      val rnd = new java.util.Random(id * 2654435761L + 42L)
      val n = 80 + rnd.nextInt(40)
      val sb = new StringBuilder
      var i = 0
      while (i < n) {
        // Zipf-ish: half the draws from a hot 200-word head
        val w = if (rnd.nextBoolean()) rnd.nextInt(200)
          else rnd.nextInt(20000)
        if (i > 0) sb += ' '
        sb ++= "w"; sb ++= w.toString
        i += 1
      }
      sb.result()
    }
    val base = spark.range(NDocs).map { id => (id, docText(id)) }
      .toDF("doc_id", "text")
    val docs = base.unionByName(
      base.filter($"doc_id" % 20 === 0)
        .select(($"doc_id" + 10000000).as("doc_id"),
          concat($"text", lit(" extra token padding")).as("text")))
    docs.write.mode("overwrite").parquet(s"$Dir/documents.parquet")
    // skewed corpus: same shape as the bench fixture — 7 hot footer
    // templates over 61% of docs, per-doc unique footers for the rest
    val u = col("doc_id") % 100
    val tpl = when(u < 35, lit(0L)).when(u < 45, lit(1L)).when(u < 51, lit(2L))
      .when(u < 55, lit(3L)).when(u < 58, lit(4L)).when(u < 60, lit(5L))
      .when(u < 61, lit(6L)).otherwise(col("doc_id") + 100)
    val k = tpl.cast("string")
    spark.range(NSkewDocs).map(id => (id, docText(id))).toDF("doc_id", "text")
      .select(col("doc_id"),
        concat(col("text"), lit(" rights t"), k, lit(" reserved t"), k,
          lit(" terms t"), k, lit(" service t"), k, lit(" privacy t"), k).as("text"))
      .write.mode("overwrite").parquet(s"$Dir/documents_skew.parquet")
    // embeddings: unit-ish gaussian vectors + 5% exact copies
    val vecs = spark.range(NVecs).map { id =>
      val rnd = new java.util.Random(id * 40503L + 7L)
      (id, Array.fill(Dim)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    vecs.unionByName(
        vecs.filter($"vec_id" % 20 === 0)
          .select(($"vec_id" + 10000000).as("vec_id"), $"embedding"))
      .write.mode("overwrite").parquet(s"$Dir/embeddings.parquet")
    new java.io.File(s"$Dir/_done").createNewFile()
  }

  /** 20k MJPEG-in-AVI items (3 solid-gray 32×16 frames, 12 fps) and 20k
    * mono PCM16 WAV items (~1.6k samples) — real containers through the
    * real encoders, generated once so the timed stages measure DECODE,
    * not synthesis. */
  private def genMedia(spark: SparkSession): Unit = {
    import spark.implicits._
    if (new java.io.File(s"$Dir/_media_done").exists()) return
    spark.range(20000).as[Long].map { id =>
      val frames = (0 until 3).map { i =>
        val g = ((id * 37 + i * 11) % 256).toInt
        val img = new java.awt.image.BufferedImage(32, 16,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (g << 16) | (g << 8) | g
        var y = 0
        while (y < 16) { var x = 0; while (x < 32) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
        img
      }
      (id, graft.operators.Multimodal.encodeMjpegAvi(frames, 12))
    }.toDF("id", "avi").write.mode("overwrite").parquet(s"$Dir/videos.parquet")
    spark.range(20000).as[Long].map { id =>
      val amp = (500 + (id % 8) * 100).toShort
      val samples = Array.tabulate[Short](1600)(i =>
        if (i % 2 == 0) amp else (-amp).toShort)
      (id, graft.operators.Multimodal.encodeWavPcm16(samples, 16000))
    }.toDF("id", "wav").write.mode("overwrite").parquet(s"$Dir/audio.parquet")
    new java.io.File(s"$Dir/_media_done").createNewFile()
  }

  /** One decade up (r11): 5.25M-doc corpus (5M base + 250k planted
    * near-dups, the sf1 structure at 100×) for the families whose cost
    * curves bend — jaccard auto dispatch, simhash pigeonhole, paragraph
    * dedup with a 525,000-copy viral paragraph, and the stored-index
    * batch probes. Generated once (simhash signatures precomputed so
    * the timed legs measure PAIRING, not hashing). */
  private val Dir10 = "/tmp/graft_sf10"
  private val NDocs10 = 5000000L

  private def gen10(spark: SparkSession): Unit = {
    import spark.implicits._
    if (new java.io.File(s"$Dir10/_done").exists()) return
    def docText(id: Long): String = {
      val rnd = new java.util.Random(id * 2654435761L + 42L)
      val n = 80 + rnd.nextInt(40)
      val sb = new StringBuilder
      var i = 0
      while (i < n) {
        val w = if (rnd.nextBoolean()) rnd.nextInt(200)
          else rnd.nextInt(20000)
        if (i > 0) sb += ' '
        sb ++= "w"; sb ++= w.toString
        i += 1
      }
      sb.result()
    }
    val base = spark.range(NDocs10).map { id => (id, docText(id)) }
      .toDF("doc_id", "text")
    base.unionByName(
        base.filter($"doc_id" % 20 === 0)
          .select(($"doc_id" + 10000000L).as("doc_id"),
            concat($"text", lit(" extra token padding")).as("text")))
      .write.mode("overwrite").parquet(s"$Dir10/documents.parquet")
    val d = spark.read.parquet(s"$Dir10/documents.parquet")
    d.select($"doc_id", graft.operators.Dedup.simhash($"text").as("simhash"))
      .write.mode("overwrite").parquet(s"$Dir10/simhash.parquet")
    new java.io.File(s"$Dir10/_done").createNewFile()
  }

  private def timed(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    val d = df
    d.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[sf1] $name%-28s ${sec}%7.2f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    import spark.implicits._
    gen(spark)
    val docs = spark.read.parquet(s"$Dir/documents.parquet")
    val skew = spark.read.parquet(s"$Dir/documents_skew.parquet")
    val emb = spark.read.parquet(s"$Dir/embeddings.parquet")
    println(s"[sf1] docs=${docs.count()} skew=${skew.count()} emb=${emb.count()}")
    // stage args (`core`, `media`, `budget`, `simhash`, `streambudget`,
    // `boundary`): run ONLY the named stages — the other stages' timings
    // are already recorded and a co-running stage would contaminate the
    // wall-clock numbers. No args = the r5-r7 stage set (the r8 stages
    // are explicit-only: they exist to measure one question each); an
    // unknown arg fails loudly rather than silently measuring nothing.
    require(args.forall(Set("core", "media", "budget", "simhash",
        "streambudget", "boundary", "retrieval", "lm", "cluster", "bpe",
        "curation", "rp", "dsir", "chunk", "pca", "layout", "zorder",
        "attrs", "paragraphs", "lid", "spm", "decade", "decadejac", "decadepara", "decadebm25", "decadesim", "decadesimkeyed", "decadeann", "decadelid", "decadespm", "decadelex", "decadecluster", "scaling")),
      s"unknown stage arg(s) ${args.mkString(", ")} — use core, media, " +
        "budget, simhash, streambudget, boundary, retrieval, lm, cluster, " +
        "bpe, curation, rp, dsir, chunk, pca, layout, zorder, attrs, " +
        "paragraphs, lid, spm, decade*")
    val budgetOnly = args.nonEmpty && !args.contains("core")
    val mediaStage = args.isEmpty || args.contains("media")
    val budgetStage = args.isEmpty || args.contains("budget")
    val simhashStage = args.contains("simhash")
    val streamBudgetStage = args.contains("streambudget")
    val boundaryStage = args.contains("boundary")
    val retrievalStage = args.contains("retrieval")
    val lmStage = args.contains("lm")
    val clusterStage = args.contains("cluster")
    val bpeStage = args.contains("bpe")
    val curationStage = args.contains("curation")
    val rpStage = args.contains("rp")
    val dsirStage = args.contains("dsir")
    val chunkStage = args.contains("chunk")
    val pcaStage = args.contains("pca")
    val layoutStage = args.contains("layout")
    val zorderStage = args.contains("zorder")
    val attrsStage = args.contains("attrs")
    val paragraphsStage = args.contains("paragraphs")
    val lidStage = args.contains("lid")
    val spmStage = args.contains("spm")
    val decadeStage = args.exists(_.startsWith("decade"))
    val decadeJac = args.contains("decade") || args.contains("decadejac")
    val decadePara = args.contains("decade") || args.contains("decadepara")
    val decadeBm25 = args.contains("decade") || args.contains("decadebm25")
    val decadeSim = args.contains("decadesim")
    val decadeSimKeyed = args.contains("decadesimkeyed")
    val decadeAnn = args.contains("decade") || args.contains("decadeann")
    val decadeLid = args.contains("decadelid")
    val decadeSpm = args.contains("decadespm")
    val decadeLex = args.contains("decadelex")
    val decadeCluster = args.contains("decadecluster")
    val scalingStage = args.contains("scaling")

    if (!budgetOnly) {
    // --- dedup family (flat 55k-doc corpus) ---
    timed("jaccard_inverted_cap100")(
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5,
        maxShingleDf = 100L))
    timed("jaccard_prefix_cap100")(
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5,
        maxShingleDf = 100L, prefixFilter = true))
    timed("jaccard_auto_flat")(
      Dedup.jaccardPairsAuto(docs, "doc_id", "text", n = 3, threshold = 0.5,
        maxShingleDf = 100L))
    timed("minhash_lsh")(
      Dedup.minhashNearDups(docs, "doc_id", "text", n = 3, bands = 4,
        threshold = 0.5))
    timed("simhash_pairs")(
      Dedup.simhashPairs(
        docs.select($"doc_id", Dedup.simhash($"text").as("simhash")),
        "doc_id", "simhash", maxHamming = 4))
    timed("simhash_pairs_auto")(
      Dedup.simhashPairsAuto(
        docs.select($"doc_id", Dedup.simhash($"text").as("simhash")),
        "doc_id", "simhash", maxHamming = 4))
    timed("strip_spans")(
      Dedup.stripHotSpans(skew, "doc_id", "text", n = 5, minDf = 20L))
    timed("resolve_purge")({
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.5, maxShingleDf = 100L)
      Dedup.purge(docs, "doc_id", Dedup.resolve(pairs, docs, "doc_id"))
    })

    // --- text/filter family at 52.5k docs (r5 verdict #8) ---
    {
      import graft.functions.TextAnalysis._
      timed("text_gopher")(docs.select(
        $"doc_id", tokenCount($"text").as("n_words"),
        round(meanWordLength($"text"), 6).as("mean_word_len"),
        round(alphaWordFraction($"text"), 6).as("alpha_frac"),
        round(symbolWordRatio($"text"), 6).as("symbol_ratio"),
        round(dupWordFraction($"text"), 6).as("dup_word_frac"),
        gopherGate($"text").as("passes")))
      timed("text_repetition")(
        Seq(2, 3).map(n =>
            docs.select($"doc_id", length($"text").as("n_chars"),
              lit(n).as("n"), graft.functions.GramStats($"text", n).as("s")))
          .reduce(_ unionByName _)
          .filter($"s.n_grams" > 0)
          .select($"doc_id", $"n",
            round($"s.top_cover".cast("double") / $"n_chars", 6).as("top_frac"),
            round($"s.dup_occ".cast("double") / $"s.n_grams", 6).as("dup_frac")))
      // gjson filters over synthesized labels on the 52.5k-doc corpus:
      // the same array-wildcard + query + key-wildcard shapes the gate
      // pins at sf0.01 (filter_json_wildcard / filter_json_keywild)
      val labeled = docs.withColumn("labels",
        when($"doc_id" % 4 === 0,
          lit("""{"tags":[{"type":"news","w":3},{"type":"blog","w":1}],"ids":[7,8],"file_a":{"size":3}}"""))
        .when($"doc_id" % 4 === 1,
          lit("""{"tags":[{"type":"blog","w":1}],"ids":[7,8],"file_bc":{"name":"n"}}"""))
        .when($"doc_id" % 4 === 2, lit("""{"tags":[{"w":2}],"ids":[7]}"""))
        .otherwise(lit("""{"other":1}""")))
      timed("filter_json_wildcard")(labeled.select($"doc_id",
        graft.operators.GjsonPath.exists($"labels", "tags.#.type").as("wild_ok"),
        graft.operators.GjsonPath.exists($"labels", """tags.#(type=="news")""").as("query_ok"),
        graft.operators.GjsonPath.exists($"labels", "file_*.size").as("star_ok"),
        graft.operators.GjsonPath.exists($"labels", "ids.1").as("idx_ok")))
      // streaming admission gate: 26.25k-doc corpus state vs a 26.25k-doc
      // batch with planted near- and exact dups (the bench query's shape
      // at 10× its rows)
      timed("stream_admit_batch")({
        val d = docs.select($"doc_id", $"text")
        val corpus = d.filter($"doc_id" % 2 === 0)
        val batch = d.filter($"doc_id" % 2 === 1)
          .unionByName(d.filter($"doc_id" % 2 === 0 && $"doc_id" < 200)
            .select(($"doc_id" + 30000001).as("doc_id"),
              concat($"text", lit(" extra token padding")).as("text")))
        val dfState = Dedup.shingleDf(corpus, "doc_id", "text", n = 3)
        graft.streaming.StreamingDedup.admitExact(batch, corpus, dfState,
          graft.streaming.StreamingDedup.DedupGateConfig(
            idCol = "doc_id", textCol = "text", n = 3, threshold = 0.5,
            maxCorpusShingleDf = 100L))
          .select("doc_id")
      })
    }

    // --- the Σ df² crossover at 4× bench scale (20k skewed docs) ---
    timed("skew_prefix_uncapped")(
      Dedup.jaccardPairs(skew, "doc_id", "text", n = 3, threshold = 0.5,
        prefixFilter = true))
    timed("skew_auto_uncapped")(
      Dedup.jaccardPairsAuto(skew, "doc_id", "text", n = 3, threshold = 0.5))
    timed("skew_inverted_uncapped")(
      Dedup.jaccardPairs(skew, "doc_id", "text", n = 3, threshold = 0.5))
    }

    // --- embedding family ---
    val dim = Dim
    if (!budgetOnly) {
    timed("cosine_lsh_8bit_fixed")(
      Dedup.cosineNearDupsLSH(emb, "vec_id", "embedding", 0.95,
        Dedup.hyperplanes(dim, count = 32), bands = 4))
    timed("cosine_lsh_auto")(
      Dedup.cosineNearDupsLSHAuto(emb, "vec_id", "embedding", 0.95))
    }
    val cfg = SearchConfig(
      scoreFuncName = "VectorDistance", higherIsBetter = false, limit = 10,
      featureCol = "embedding", keyCols = Seq("vec_id"),
      tieBreakCol = Some("vec_id"), assumeUniqueKeys = true)
    val queries = emb.filter($"vec_id" < 100)
      .select($"vec_id".as(Search.QueryIdCol), $"embedding")
    if (!budgetOnly) {
    timed("exact_multi_100")(
      Search.multiSearch(emb, queries, cfg.copy(limit = 5)))
    val t0 = System.nanoTime()
    val (indexed, centroids) = Ann.ivfBuild(emb, "embedding", k = 32,
      normalize = false)
    indexed.cache().count()
    println(f"[sf1] ivf_build_k32              ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    timed("ivf_multi_100_probe8")(
      Ann.ivfMultiSearch(indexed, centroids, queries, cfg.copy(limit = 5),
        nProbe = 8))
    timed("lsh_multi_100")(
      Ann.lshMultiSearch(emb, queries, cfg.copy(limit = 5),
        Dedup.hyperplanes(dim, count = 16), bands = 4))
    val t1 = System.nanoTime()
    val sq8 = Ann.sq8Encode(emb, "embedding").cache()
    sq8.count()
    println(f"[sf1] sq8_encode                 ${(System.nanoTime() - t1) / 1e9}%7.2f s")
    timed("sq8_knn")(
      Ann.sq8Search(sq8, emb.filter($"vec_id" === 0)
        .select("embedding").head.getSeq[Float](0), cfg, refine = 4))
    }

    // --- multimodal decode at rehearsal scale (r7): 60k JPEG frame
    // decodes (20k AVIs × 3) and 20k WAV streams through the REAL
    // decoders — partition-local, no shuffle, expected ~linear ---
    if (mediaStage) {
      import graft.operators.Multimodal
      genMedia(spark)
      val videos = spark.read.parquet(s"$Dir/videos.parquet")
      val audio = spark.read.parquet(s"$Dir/audio.parquet")
      def asItems(df: DataFrame, payload: String, modality: String) =
        df.select($"id", col(payload).as("content"),
          struct(lit(modality).as("modality"), lit(0).as("width"),
            lit(0).as("height"), lit(0).as("sampleRate"),
            lit(0L).as("durationMs")).as("meta")).as[Multimodal.MediaItem]
      timed("video_decode_20k")(
        Multimodal.featurizeVideo(asItems(videos, "avi", "video")).toDF())
      timed("audio_decode_20k")(
        Multimodal.featurizeAudio(asItems(audio, "wav", "audio")).toDF())
    }

    if (budgetStage) {
    // --- budgeted search at rehearsal scale (r6 verdict #3): 100
    // queries over the 52.5k-vector corpus through the INCREMENTAL
    // driver merge (r7) — ample budget must equal the deterministic
    // batch result; a tight budget returns a documented partial.
    // driverPeakRows is the r7 bound under test: merge state
    // (≤ k·queries) + one batch (≤ batchPartitions·k·queries). ---
    {
      import graft.operators.BudgetedSearch
      val bCfg = cfg.copy(limit = 5)
      val det = Search.multiSearch(emb, queries, bCfg)
        .select(Search.QueryIdCol, "vec_id", Search.ScoreCol)
        .as[(Long, Long, Double)].collect().toSet
      val t2 = System.nanoTime()
      val ample = BudgetedSearch.multiSearch(emb, queries, bCfg,
        budgetMs = 600000L, batchPartitions = 8)
      val ampleRows = ample.rows
        .select(Search.QueryIdCol, "vec_id", Search.ScoreCol)
        .as[(Long, Long, Double)].collect().toSet
      val ampleSec = (System.nanoTime() - t2) / 1e9
      println(f"[sf1] budget_multi_100_ample    ${ampleSec}%7.2f s " +
        s"scanned=${ample.scannedPartitions}/${ample.totalPartitions} " +
        s"complete=${ample.complete} driverPeakRows=${ample.driverPeakRows}")
      assert(ample.complete, "ample budget must finish the scan")
      assert(ampleRows == det,
        s"ample budget diverged: ${ampleRows.size} vs deterministic ${det.size}")
      println("[sf1] budget_multi_100_ample    == deterministic multiSearch (set-equal)")
      val t3 = System.nanoTime()
      val tight = BudgetedSearch.multiSearch(emb, queries, bCfg,
        budgetMs = 1500L, batchPartitions = 2)
      val tightN = tight.rows.count()
      val tightSec = (System.nanoTime() - t3) / 1e9
      println(f"[sf1] budget_multi_100_tight    ${tightSec}%7.2f s " +
        s"scanned=${tight.scannedPartitions}/${tight.totalPartitions} " +
        s"complete=${tight.complete} driverPeakRows=${tight.driverPeakRows} " +
        s"rows=$tightN")
      // grouped two-level pools at scale: 1000 groups over 52.5k
      // vectors — the O(groups × groupLimit) driver-state regime the
      // maxDriverRows guard documents; ample budget must equal the
      // deterministic grouped search
      val gEmb = emb.withColumn("group_label",
        (org.apache.spark.sql.functions.col("vec_id") % 1000).cast("string"))
      val gCfg = cfg.copy(limit = 5, groupLimit = 3,
        groupLabelCol = "group_label")
      val q0 = emb.filter($"vec_id" === 0).select("embedding").head.getSeq[Float](0)
      val gDet = Search.search(gEmb, q0, gCfg)
        .select("group_label", Search.ScoreCol, "vec_id")
        .as[(String, Double, Long)].collect().toSeq
      val t4 = System.nanoTime()
      val g = BudgetedSearch.search(gEmb, q0, gCfg, budgetMs = 600000L,
        batchPartitions = 8)
      val gGot = g.rows.select("group_label", Search.ScoreCol, "vec_id")
        .as[(String, Double, Long)].collect().toSeq
      val gSec = (System.nanoTime() - t4) / 1e9
      println(f"[sf1] budget_grouped_1000g      ${gSec}%7.2f s " +
        s"scanned=${g.scannedPartitions}/${g.totalPartitions} " +
        s"complete=${g.complete} driverPeakRows=${g.driverPeakRows}")
      assert(g.complete && gGot == gDet,
        s"grouped ample diverged: $gGot vs $gDet")
      println("[sf1] budget_grouped_1000g      == deterministic grouped search (row-equal)")
    }
    }

    if (boundaryStage) {
    // --- grouped-budget maxDriverRows boundary at realistic cardinality
    // (r7 verdict #7): 200k vectors, EVERY row its own group — the exact
    // grouped answer must track every (query, group) pool, so the merge
    // state grows with distinct groups seen. With maxDriverRows lowered
    // to 100k the loud-fail must fire at the FIRST batch fold that
    // crosses the bound (held ≤ bound + one batch), long BEFORE any
    // driver memory pressure; the same run at the 8M default completes
    // with a measured peak. Toy-scale spec: BudgetedSearchSpec. ---
    {
      import graft.operators.BudgetedSearch
      val nBig = 200000
      val bigEmb = spark.range(nBig).map { id =>
        val rnd = new java.util.Random(id * 40503L + 7L)
        (id, Array.fill(Dim)(rnd.nextGaussian().toFloat))
      }.toDF("vec_id", "embedding")
        .withColumn("group_label", col("vec_id").cast("string"))
        .repartition(32).localCheckpoint(true)
      val gCfg = cfg.copy(limit = 5, groupLimit = 3,
        groupLabelCol = "group_label")
      val q0 = bigEmb.filter($"vec_id" === 0).select("embedding")
        .head.getSeq[Float](0)
      val rt = Runtime.getRuntime
      def usedMb: Long = (rt.totalMemory() - rt.freeMemory()) >> 20
      val bound = 100000L
      val batchRows = nBig / 32 * 8 // one 8-partition batch
      val m0 = usedMb
      val t0 = System.nanoTime()
      val failed =
        try {
          BudgetedSearch.search(bigEmb, q0, gCfg, budgetMs = 600000L,
            batchPartitions = 8, maxDriverRows = bound)
          None
        } catch { case e: IllegalStateException => Some(e.getMessage) }
      val sec = (System.nanoTime() - t0) / 1e9
      assert(failed.isDefined, "maxDriverRows loud-fail did not fire")
      val msg = failed.get
      assert(msg.contains("maxDriverRows"), msg)
      val held = "holds (\\d+) rows".r.findFirstMatchIn(msg).get.group(1).toLong
      assert(held > bound && held <= bound + batchRows,
        s"fired at held=$held — not the first bound-crossing fold " +
          s"(bound=$bound, batch=$batchRows)")
      println(f"[sf1] boundary_200kg_loudfail   $sec%7.2f s held=$held " +
        s"(bound=$bound + one batch ≤ ${bound + batchRows}) " +
        s"heapDelta=${usedMb - m0}MB")
      val t1 = System.nanoTime()
      val ok = BudgetedSearch.search(bigEmb, q0, gCfg, budgetMs = 600000L,
        batchPartitions = 8)
      ok.rows.count()
      println(f"[sf1] boundary_200kg_default    ${(System.nanoTime() - t1) / 1e9}%7.2f s " +
        s"complete=${ok.complete} driverPeakRows=${ok.driverPeakRows} " +
        s"(${ok.driverPeakRows * 100 / BudgetedSearch.DefaultMaxDriverRows}% of the 8M default)")
      assert(ok.complete && ok.driverPeakRows > bound,
        "default-bound contrast run must complete past the lowered bound")
    }
    }

    if (streamBudgetStage) {
    // --- budget × streaming composition (r7 verdict #6): the production
    // shape the reference actually runs (data/data.go:145-168) —
    // CONTINUOUS ingest into a versioned state table with incremental
    // IVF maintenance, budgeted probes running between micro-batches.
    // 30k base + 5 streamed batches of 4.5k (→ 52.5k). After EVERY batch:
    // ample-budget multiSearch must be complete and set-equal to the
    // deterministic search on the current state, and the STORED index
    // (base build + per-batch ivfAppend, periodic ivfCompact swap) must
    // resolve 50 self-queries to themselves at distance 0 with the row
    // count tracking state exactly. ---
    {
      import graft.operators.{Ann, BudgetedSearch}
      import graft.operators.Ingest.IngestConfig
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext

      val runTag = java.util.UUID.randomUUID().toString.take(8)
      val stateDir = s"$Dir/stream_state_$runTag"
      val idxDir = s"$Dir/stream_ivf_$runTag"
      // local copy: a def reading the module's Dim would pull the whole
      // (non-serializable) rehearsal object into the map closures
      val d0 = Dim
      def vec(id: Long): Array[Float] = {
        val rnd = new java.util.Random(id * 40503L + 7L)
        Array.fill(d0)(rnd.nextGaussian().toFloat)
      }
      val nBase = 30000L
      val batchSize = 4500L

      var stateVersion = 0
      var statePath = s"$stateDir/v0"
      spark.range(nBase).map(id => (id, vec(id))).toDF("vec_id", "embedding")
        .repartition(16).write.parquet(statePath)
      def readState(): DataFrame = spark.read.parquet(statePath)
      // versioned write: merged still lazily reads the PREVIOUS version,
      // so each batch lands in a fresh dir (the upsertWriter contract)
      def writeState(df: DataFrame): Unit = {
        stateVersion += 1
        val p = s"$stateDir/v$stateVersion"
        df.repartition(16).write.parquet(p)
        statePath = p
      }
      val tIvf = System.nanoTime()
      val (indexed0, cents0) =
        Ann.ivfBuild(readState(), "embedding", k = 32, normalize = false)
      Ann.ivfSave(idxDir, indexed0, cents0)
      println(f"[sf1] sb_ivf_build_30k          ${(System.nanoTime() - tIvf) / 1e9}%7.2f s")

      val sCfg = cfg.copy(limit = 5)
      val probeQueries = spark.range(50).map(id => (id, vec(id)))
        .toDF(Search.QueryIdCol, "embedding").localCheckpoint(true)

      def selfHits(stored: DataFrame, cents: Array[Array[Double]]): Unit = {
        val top = Ann.ivfMultiSearch(stored, cents, probeQueries,
            sCfg.copy(limit = 1), nProbe = 1)
          .select(col(Search.QueryIdCol), col("vec_id"), col(Search.ScoreCol))
          .as[(Long, Long, Double)].collect()
        assert(top.length == 50 && top.forall { case (q, v, s) => q == v && s == 0.0 },
          s"stored-index self-queries missed: ${top.filterNot(t => t._1 == t._2 && t._3 == 0.0).toSeq}")
      }

      for (b <- 1 to 5) {
        val lo = nBase + (b - 1) * batchSize
        val stream = MemoryStream[(Long, Array[Float])]
        stream.addData((lo until lo + batchSize).map(id => (id, vec(id))))
        val tIn = System.nanoTime()
        val q = graft.streaming.StreamingIngest.upsertWriter(
          stream.toDF.toDF("vec_id", "embedding"),
          IngestConfig(Seq("vec_id"), Seq("embedding")),
          readState _, writeState,
          onBatchRows = (landed, _) =>
            Ann.ivfAppend(spark, idxDir,
              landed.select("vec_id", "embedding"), "embedding",
              normalize = false)).start()
        q.awaitTermination(120000)
        val ingestSec = (System.nanoTime() - tIn) / 1e9

        val state = readState()
        val stateN = state.count()
        val det = Search.multiSearch(state, probeQueries, sCfg)
          .select(col(Search.QueryIdCol), col("vec_id"), col(Search.ScoreCol))
          .as[(Long, Long, Double)].collect().toSet
        val tB = System.nanoTime()
        val amp = BudgetedSearch.multiSearch(state, probeQueries, sCfg,
          budgetMs = 600000L, batchPartitions = 8)
        val got = amp.rows
          .select(col(Search.QueryIdCol), col("vec_id"), col(Search.ScoreCol))
          .as[(Long, Long, Double)].collect().toSet
        val budgetSec = (System.nanoTime() - tB) / 1e9
        assert(amp.complete, s"batch $b: ample budget incomplete")
        assert(got == det, s"batch $b: budgeted diverged from deterministic " +
          s"(${got.size} vs ${det.size} rows)")
        val (stored, cents) = Ann.ivfLoad(spark, idxDir)
        val storedN = stored.count()
        assert(storedN == stateN,
          s"batch $b: stored index $storedN rows vs state $stateN")
        selfHits(stored, cents)
        println(f"[sf1] sb_batch$b n=$stateN%-6s ingest=$ingestSec%5.2f s " +
          f"budget_probe=$budgetSec%5.2f s complete=${amp.complete} " +
          s"peak=${amp.driverPeakRows} ivf=$storedN rows, self-hit 50/50")

        if (b == 3) {
          // tight-budget probe BETWEEN batches (r8 verdict #7 carry-
          // forward): the partial-result contract — exact rows over the
          // scanned subset, complete=false, bounded driver peak — must
          // hold against the live, mid-growth state table, not only in
          // unit specs. Each partition sleeps 400 ms so the 900 ms
          // budget expires mid-scan deterministically (16 partitions in
          // batches of 2 would need ~3.2 s serial).
          val slowState = state.as[(Long, Array[Float])]
            .mapPartitions { it => Thread.sleep(400); it }
            .toDF("vec_id", "embedding")
          val tT = System.nanoTime()
          val part = BudgetedSearch.multiSearch(slowState, probeQueries,
            sCfg, budgetMs = 900L, batchPartitions = 2)
          val pairs = part.rows
            .select(col(Search.QueryIdCol), col("vec_id"), col(Search.ScoreCol))
            .as[(Long, Long, Double)].collect().toSeq
          val tightSec = (System.nanoTime() - tT) / 1e9
          assert(!part.complete && part.scannedPartitions < part.totalPartitions,
            s"tight probe completed (${part.scannedPartitions}/${part.totalPartitions}) " +
              "— raise the per-partition sleep")
          // peak bound: merge state (50 q × 5) + one batch (2 parts × 250)
          assert(part.driverPeakRows <= 750,
            s"driver peak ${part.driverPeakRows} > 750 bound")
          assert(pairs.groupBy(_._1).values.forall(_.size <= sCfg.limit),
            "a query returned more than limit rows")
          // every returned row is a REAL state row with its true score:
          // join the ≤250 pairs against the deterministic scored stage
          val pairDf = pairs.toDF("q", "v", "s")
          val joined = BudgetedSearch
            .scoredStageMulti(state, probeQueries, sCfg)
            .join(org.apache.spark.sql.functions.broadcast(pairDf),
              col(Search.QueryIdCol) === col("q") && col("vec_id") === col("v"))
            .select(col(Search.ScoreCol), col("s"))
            .as[(Double, Double)].collect()
          assert(joined.length == pairs.size,
            s"tight probe returned ${pairs.size - joined.length} rows absent " +
              "from the scored stage")
          joined.foreach { case (truth, got) =>
            assert(truth == got, s"tight probe score $got != true $truth") }
          println(f"[sf1] sb_tight_probe$b         $tightSec%7.2f s " +
            s"scanned=${part.scannedPartitions}/${part.totalPartitions} " +
            s"complete=${part.complete} peak=${part.driverPeakRows} " +
            s"rows=${pairs.size} (all true-scored, live table n=$stateN)")
        }

        if (b % 2 == 0) { // the reference's periodic maintenance cycle
          val tC = System.nanoTime()
          Ann.ivfCompact(spark, idxDir, readState().select("vec_id"), "vec_id")
          val (st2, c2) = Ann.ivfLoad(spark, idxDir)
          assert(st2.count() == stateN, s"batch $b: compaction lost rows")
          selfHits(st2, c2)
          println(f"[sf1] sb_compact$b              ${(System.nanoTime() - tC) / 1e9}%7.2f s " +
            "(swap under readers; counts + self-hits re-verified)")
        }
      }
    }
    }

    if (simhashStage) {
    // --- simhashAutoBlocks WIDENING regime (r7 verdict #1): the only
    // auto dispatcher whose switch-over had never been observed on both
    // sides. 420k flat fingerprints (uniform 60-bit — the flattest
    // possible "vocab") with 20k planted near-dup pairs, so the true
    // pair count stays bounded and the measured cost is COLLISION-bound,
    // not output-bound (the r6 Zipf lesson). d=4: the model crosses to
    // B=6 at ~250k docs; 150k is the below-crossover control. Output is
    // B-invariant (exact pigeonhole recall), asserted per run. ---
    {
      val d = 4
      val mask60 = (1L << 60) - 1
      def flat(n: Long, plant: Long): DataFrame = {
        val base = spark.range(n).select(col("id").as("doc_id"),
          xxhash64(col("id")).bitwiseAND(lit(mask60)).as("simhash"))
        // planted dup i pairs with base i: fingerprint XOR ≤ d bit flips
        // at deterministic positions (coinciding positions cancel —
        // hamming stays ≤ d either way)
        val flip = (0 until d).map(j =>
            call_function("shiftleft", lit(1L),
              pmod(col("id") * lit(2654435761L + j * 40503L) + lit(j * 17),
                lit(60)).cast("int")))
          .reduce((a, b) => a.bitwiseXOR(b))
        val dups = spark.range(plant).select(
          (col("id") + 100000000L).as("doc_id"),
          xxhash64(col("id")).bitwiseAND(lit(mask60)).bitwiseXOR(flip)
            .bitwiseAND(lit(mask60)).as("simhash"))
        base.unionByName(dups).repartition(32).localCheckpoint(true)
      }
      def run(label: String, fp: DataFrame, n: Long, blocks: Int): Long = {
        val t0 = System.nanoTime()
        val c = Dedup.simhashPairs(fp, "doc_id", "simhash",
          maxHamming = d, blocks = blocks).count()
        println(f"[sf1] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s " +
          s"pairs=$c (B=$blocks)")
        c
      }
      for (n <- Seq(150000L, 420000L, 1000000L)) {
        val plant = n / 21
        val auto = Dedup.simhashAutoBlocks(n + plant, d)
        println(s"[sf1] simhash n=${n + plant} d=$d autoBlocks=$auto " +
          s"(default=${d + 1})")
        val fp = flat(n, plant)
        val cDefault = run(s"simhash_${n / 1000}k_default", fp, n, d + 1)
        val cWide = run(s"simhash_${n / 1000}k_wide", fp, n,
          if (auto > d + 1) auto else d + 2)
        assert(cDefault == cWide,
          s"B-invariance violated: $cDefault vs $cWide")
        assert(cDefault >= plant,
          s"planted pairs lost: $cDefault < $plant")
      }
    }
    }

    if (retrievalStage) {
    // --- BM25 retrieval at rehearsal scale (r9): the batch path's one
    // shuffle is capped by MATCHED POSTINGS, so wall clock must grow
    // ~linearly with corpus size for a fixed query batch; and the
    // inverted-index scores must equal the single-query column path's
    // at scale (the toy-corpus agreement spec, re-asserted at 52.5k
    // docs with realistic df spread). Query batch: 50 queries × 3
    // terms, half drawn from the hot 200-word head (df ≈ a fifth of
    // the corpus), half from the 20k tail (df ≈ hundreds) — the df mix
    // a real workload has. ---
    {
      import graft.operators.TextRetrieval
      val qrows = (0 until 50).map { q =>
        val rnd = new java.util.Random(q * 9176L + 11L)
        def term() = if (rnd.nextBoolean()) s"w${rnd.nextInt(200)}"
          else s"w${rnd.nextInt(20000)}"
        (q.toLong, s"${term()} ${term()} ${term()}")
      }
      val queries = qrows.toDF("query_id", "qtext")
      val docsSmall = docs.filter($"doc_id" % 10 === 0).localCheckpoint(true)
      println(s"[sf1] bm25 corpora: small=${docsSmall.count()} full=${docs.count()}")
      // warmup (JIT, codegen, broadcast machinery): this stage runs alone,
      // so without it the FIRST timed call absorbs JVM warmup and the
      // small-corpus number reads larger than the 7× corpus
      TextRetrieval.bm25Multi(docsSmall, "doc_id", "text", queries,
        "query_id", "qtext", k = 10).write.format("noop").mode("overwrite").save()
      timed("bm25_multi_5k")(TextRetrieval.bm25Multi(
        docsSmall, "doc_id", "text", queries, "query_id", "qtext", k = 10))
      timed("bm25_multi_52k")(TextRetrieval.bm25Multi(
        docs, "doc_id", "text", queries, "query_id", "qtext", k = 10))
      timed("bm25_single_52k")(TextRetrieval.bm25(
        docs, "doc_id", "text", Seq("w5", "w1742", "w9096"), k = 10))

      // stored index: one-time build, then the batch reads ONLY pruned
      // postings — no corpus rescan, no stats job. The gap vs
      // bm25_multi_52k is the repeated-retrieval win and widens with
      // corpus size (the raw path rescans+explodes the corpus per batch)
      val idxDir = s"$Dir/lex_idx_${java.util.UUID.randomUUID().toString.take(8)}"
      val tBuild = System.nanoTime()
      TextRetrieval.indexSave(idxDir,
        TextRetrieval.indexBuild(docs, "doc_id", "text"),
        TextRetrieval.corpusStats(docs, "text"))
      println(f"[sf1] bm25_index_build_52k      ${(System.nanoTime() - tBuild) / 1e9}%7.2f s")
      val idx = TextRetrieval.indexLoad(spark, idxDir)
      timed("bm25_indexed_52k")(TextRetrieval.bm25Indexed(
        idx, "doc_id", queries, "query_id", "qtext", k = 10))
      // hot-term df cap on the SAME mixed batch: hot-head terms
      // (df/N ≈ 0.2) are cut at ratio 0.01, so their posting lists —
      // ~99% of the matched volume — are never read; the surviving tail
      // terms carry nearly all the idf mass anyway
      timed("bm25_indexed_cap_52k")(TextRetrieval.bm25Indexed(
        idx, "doc_id", queries, "query_id", "qtext", k = 10,
        maxDfRatio = 0.01))

      // selectivity contrast: a TAIL-ONLY batch (df ≈ hundreds per term,
      // ~10k matched postings total). The raw path still pays the full
      // corpus tokenize+explode regardless of selectivity; the stored
      // index reads only what the vocabulary matches — this is where the
      // pruned layout's win is structural, not constant-factor
      val tailQ = (0 until 50).map { q =>
        val rnd = new java.util.Random(q * 777L + 5L)
        def t() = s"w${200 + rnd.nextInt(19800)}"
        (q.toLong, s"${t()} ${t()} ${t()}")
      }.toDF("query_id", "qtext")
      timed("bm25_multi_tail_52k")(TextRetrieval.bm25Multi(
        docs, "doc_id", "text", tailQ, "query_id", "qtext", k = 10))
      timed("bm25_indexed_tail_52k")(TextRetrieval.bm25Indexed(
        idx, "doc_id", tailQ, "query_id", "qtext", k = 10))

      // in-run invariant at scale: ALL matching docs for one tail-heavy
      // query, k unbounded (no rank boundary to sit inside FP-sum
      // noise), scores rounded to the oracle's 6 decimals — the batch
      // path must land on exactly the single path's rows
      val invQ = qrows(7)
      val multi = TextRetrieval.bm25Multi(docs, "doc_id", "text",
          queries.filter($"query_id" === invQ._1), "query_id", "qtext",
          k = Int.MaxValue)
        .select($"doc_id", round($"score", 6).as("score"))
        .as[(Long, Double)].collect().toSet
      val single = TextRetrieval.bm25(docs, "doc_id", "text",
          invQ._2.split(' ').toSeq, k = Int.MaxValue)
        .select($"doc_id", round($"score", 6).as("score"))
        .as[(Long, Double)].collect().toSet
      assert(multi == single,
        s"batch != single at 52.5k docs: ${multi.size} vs ${single.size} rows, " +
          s"diff=${(multi diff single).take(3)} / ${(single diff multi).take(3)}")
      println(s"[sf1] bm25_multi==single        rows=${multi.size} (query '${invQ._2}')")
      val indexed = TextRetrieval.bm25Indexed(idx, "doc_id",
          queries.filter($"query_id" === invQ._1), "query_id", "qtext",
          k = Int.MaxValue)
        .select($"doc_id", round($"score", 6).as("score"))
        .as[(Long, Double)].collect().toSet
      assert(indexed == single,
        s"indexed != single at 52.5k docs: ${indexed.size} vs ${single.size} rows")
      println(s"[sf1] bm25_indexed==single      rows=${indexed.size}")

      // live-ingest maintenance: 3 appended batches of 2.5k NEW docs
      // (same generator, shifted ids). After EVERY append the stored
      // index must serve exactly what a raw-corpus batch query over the
      // grown union serves — stats exact (integer token totals), df
      // delta log merged, new postings immediately visible
      var grown = docs
      val invQdf = queries.filter($"query_id" === invQ._1)
      // local generator copy (the streambudget `vec` rationale: a def
      // reaching into gen() would drag the rehearsal object into the
      // map closures); same text shape as the base corpus
      def appendText(id: Long): String = {
        val rnd = new java.util.Random(id * 2654435761L + 42L)
        val n = 80 + rnd.nextInt(40)
        val sb = new StringBuilder
        var i = 0
        while (i < n) {
          val w = if (rnd.nextBoolean()) rnd.nextInt(200) else rnd.nextInt(20000)
          if (i > 0) sb += ' '
          sb ++= "w"; sb ++= w.toString
          i += 1
        }
        sb.result()
      }
      for (b <- 1 to 3) {
        val lo = 20000000L + (b - 1) * 2500L
        val batchDocs = spark.range(lo, lo + 2500L)
          .map(id => (id, appendText(id % 1000000)))
          .toDF("doc_id", "text")
        val tA = System.nanoTime()
        val st = TextRetrieval.indexAppend(spark, idxDir, batchDocs, "doc_id", "text")
        val aSec = (System.nanoTime() - tA) / 1e9
        grown = grown.unionByName(batchDocs)
        val idxB = TextRetrieval.indexLoad(spark, idxDir)
        assert(idxB.stats == st, "load/append stats diverged")
        val viaIdx = TextRetrieval.bm25Indexed(idxB, "doc_id", invQdf,
            "query_id", "qtext", k = Int.MaxValue)
          .select($"doc_id", round($"score", 6).as("score"))
          .as[(Long, Double)].collect().toSet
        val viaRaw = TextRetrieval.bm25Multi(grown, "doc_id", "text", invQdf,
            "query_id", "qtext", k = Int.MaxValue)
          .select($"doc_id", round($"score", 6).as("score"))
          .as[(Long, Double)].collect().toSet
        assert(viaIdx == viaRaw,
          s"append $b diverged: ${viaIdx.size} vs ${viaRaw.size} rows")
        println(f"[sf1] bm25_append_b$b            $aSec%7.2f s " +
          s"n=${st.n} rows=${viaIdx.size} (== raw union)")
      }
    }
    }

    if (scalingStage) {
    // --- core-count scaling probe (r13, VERDICT r12 #8): at sf0.1 the
    // driver's 8-core bench ran as fast as 32-core because per-query
    // fixed cost swamps compute; THIS leg runs kernel-bound operators
    // over the 50k-doc sf1 corpus so c8/c32 wall-clock ratios measure
    // parallelism where compute dominates. Run it twice:
    //   SPARK_GRAFT_CPUS=32 sbt "Test/runMain ... scaling"
    //   SPARK_GRAFT_CPUS=8  sbt "Test/runMain ... scaling"
    // and tabulate (OPTIMIZATION_r13.md records the r13 table). ---
      import graft.operators.{LangId, LangIdFixture, LanguageModel}
      val model = LangId.train(
        LangIdFixture.Train.toDF("lang", "text"), "lang", "text", 5, 20000)
      // warmups (JIT + codegen) on small slices, then the timed kernels
      LangId.scoreDocs(docs.filter($"doc_id" % 100 === 0), "doc_id",
        "text", model).write.format("noop").mode("overwrite").save()
      timed("scaling_lid_score_55k")(
        LangId.scoreDocs(docs, "doc_id", "text", model))
      timed("scaling_simhash_55k")(
        docs.select($"doc_id", Dedup.simhash($"text").as("simhash")))
      val lmS = LanguageModel.trainBigram(
        docs.filter($"doc_id" % 10 === 0), "text",
        vocabCap = 2000, bigramMinCount = 2, bigramCap = 20000)
      LanguageModel.scoreDocs(docs.filter($"doc_id" % 100 === 0),
        "doc_id", "text", lmS).write.format("noop").mode("overwrite").save()
      timed("scaling_lm_score_55k")(
        LanguageModel.scoreDocs(docs, "doc_id", "text", lmS))
      val vecs6k = emb.filter($"vec_id" < 6000).localCheckpoint(true)
      timed("scaling_cosine_n2_6k")(
        Dedup.cosineNearDups(vecs6k, "vec_id", "embedding", 0.95))
    }

    if (decadeStage) {
    // --- the 5.25M decade (r11 #4): each leg runs at 525k AND 5.25M so
    // BASELINE.md records a measured growth factor per decade, not an
    // extrapolation. 128 shuffle partitions (the sf1 default of 32
    // leaves ~160k docs/partition at this scale). ---
    {
      import graft.operators.{Dedup, TextRetrieval}
      spark.conf.set("spark.sql.shuffle.partitions", "128")
      val tGen = System.nanoTime()
      gen10(spark)
      println(f"[sf1] decade_gen                ${(System.nanoTime() - tGen) / 1e9}%7.2f s")
      val d10 = spark.read.parquet(s"$Dir10/documents.parquet")
      // the 525k slice keeps the planted-dup structure (base ids < 500k
      // and their +10M near-copies)
      val d525 = d10.filter($"doc_id" < 500000L ||
        ($"doc_id" >= 10000000L && $"doc_id" < 10500000L))
        .localCheckpoint(true)
      println(s"[sf1] decade corpora: 525k=${d525.count()} 5.25M=${d10.count()}")

      if (decadeJac) {
      // jaccard auto dispatch (df cap 100 — the production cap)
      timed("jaccard_auto_525k")(
        Dedup.jaccardPairsAuto(d525, "doc_id", "text", n = 3,
          threshold = 0.5, maxShingleDf = 100L, knownRows = 525000L))
      timed("jaccard_auto_5m")(
        Dedup.jaccardPairsAuto(d10, "doc_id", "text", n = 3,
          threshold = 0.5, maxShingleDf = 100L, knownRows = 5250000L))
      }

      if (decadeSim) {
      // simhash pigeonhole (signatures precomputed at gen — the timed
      // leg is the pairing, whose plan is what widens with n)
      val sig10 = spark.read.parquet(s"$Dir10/simhash.parquet")
      val sig525 = sig10.filter($"doc_id" < 500000L ||
        ($"doc_id" >= 10000000L && $"doc_id" < 10500000L))
        .localCheckpoint(true)
      timed("simhash_auto_525k")(
        Dedup.simhashPairsAuto(sig525, "doc_id", "simhash",
          maxHamming = 4, knownRows = 525000L))
      timed("simhash_auto_5m")(
        Dedup.simhashPairsAuto(sig10, "doc_id", "simhash",
          maxHamming = 4, knownRows = 5250000L))
      }

      if (decadeSimKeyed) {
      // signature-KEYED dedup (r12, the r11 refusal's named fix): first
      // reproduce the refusal — this corpus's true hamming≤4 pair set is
      // quadratic (r11 measured ~1.6e8 pairs at 525k) — then run the
      // keep-first operator, which must COMPLETE at both scales with
      // ~linear cost (3 linear passes over 35 band keys per doc)
      val sig10 = spark.read.parquet(s"$Dir10/simhash.parquet")
      val sig525 = sig10.filter($"doc_id" < 500000L ||
        ($"doc_id" >= 10000000L && $"doc_id" < 10500000L))
        .localCheckpoint(true)
      try {
        Dedup.simhashPairsAuto(sig525, "doc_id", "simhash", maxHamming = 4,
          knownRows = 525000L, maxProjectedPairs = 10000000L)
          .write.format("noop").mode("overwrite").save()
        assert(false, "expected the density-guard refusal at 525k")
      } catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage.contains("simhashKeyedKeep"), e.getMessage)
          println("[sf1] simhash_refusal_525k       reproduced; names simhashKeyedKeep")
      }
      def keyedLeg(tag: String, sig: DataFrame, nExpect: Long): Unit = {
        val t0 = System.nanoTime()
        val verdicts = Dedup.simhashKeyedKeep(sig, "doc_id", "simhash",
          maxHamming = 4).localCheckpoint(true)
        val n = verdicts.count()
        val kept = verdicts.filter($"keep").count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[sf1] simhash_keyed_$tag%-13s $sec%7.2f s ($n verdicts, $kept kept)")
        assert(n == nExpect, s"verdict rows $n != $nExpect")
        assert(kept > 0 && kept < nExpect)
        org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(verdicts)
      }
      keyedLeg("525k", sig525, 525000L)
      keyedLeg("5m", sig10, 5250000L)
      // greedy-MIS refinement (r12): rounds=3 must re-admit the
      // chain-dropped mass and keep strictly more than single-pass
      // keep-first, still completing linearly
      def misLeg(tag: String, sig: DataFrame, nExpect: Long): Unit = {
        val t0 = System.nanoTime()
        val verdicts = Dedup.simhashKeyedKeep(sig, "doc_id", "simhash",
          maxHamming = 4, rounds = 3).localCheckpoint(true)
        val n = verdicts.count()
        val kept = verdicts.filter($"keep").count()
        val undecided = verdicts.filter(!$"keep" && $"rep".isNull).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[sf1] simhash_mis3_$tag%-12s $sec%7.2f s " +
          s"($n verdicts, $kept kept, $undecided undecided)")
        assert(n == nExpect, s"verdict rows $n != $nExpect")
        org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(verdicts)
      }
      misLeg("525k", sig525, 525000L)
      misLeg("5m", sig10, 5250000L)
      }

      if (decadePara) {
      // paragraph dedup with a VIRAL paragraph on 10% of docs (525,000
      // copies at full scale) + 1,000 hot footer templates
      def paraCorpus(d: DataFrame) = d.select($"doc_id",
        concat(
          lit("unique head of document "), $"doc_id", lit("\n"),
          when($"doc_id" % 10 === 0,
            lit("viral boilerplate paragraph shared across the corpus\n"))
            .otherwise(lit("")),
          lit("shared rights footer template "), $"doc_id" % 1000,
          lit(" all rights reserved\n"),
          lit("unique tail of document "), $"doc_id").as("text"))
      def paraLeg(name: String, d: DataFrame, nExpect: Long): Unit = {
        val t0 = System.nanoTime()
        val cleaned = Dedup.dedupParagraphs(paraCorpus(d), "doc_id", "text",
          "\n", minChars = 5).localCheckpoint(true)
        val sec = (System.nanoTime() - t0) / 1e9
        val n = cleaned.count()
        val viral = cleaned.filter($"text".contains("viral boilerplate")).count()
        val footer = cleaned.filter($"text".contains("rights footer")).count()
        println(f"[sf1] $name%-28s $sec%7.2f s ($n rows; viral->$viral, footers->$footer)")
        assert(n == nExpect, s"row count $n != $nExpect")
        assert(viral == 1L, s"viral kept $viral times, want 1")
        assert(footer == 1000L, s"footer survivors $footer, want 1000")
      }
      paraLeg("dedup_paragraphs_525k", d525, 525000L)
      paraLeg("dedup_paragraphs_5m", d10, 5250000L)
      }

      if (decadeBm25) {
      // stored-index batch probes: build once per scale, then a 50-query
      // batch reads only pruned postings — the probe cost must stay
      // ~flat while the corpus (and build) grows 10×
      val qrows = (0 until 50).map { q =>
        val rnd = new java.util.Random(q * 9176L + 11L)
        def term() = if (rnd.nextBoolean()) s"w${rnd.nextInt(200)}"
          else s"w${rnd.nextInt(20000)}"
        (q.toLong, s"${term()} ${term()} ${term()}")
      }
      val queries = qrows.toDF("query_id", "qtext")
      def bm25Leg(tag: String, d: DataFrame): Unit = {
        val idxDir = s"$Dir10/lex_idx_${tag}_${java.util.UUID.randomUUID().toString.take(8)}"
        val tB = System.nanoTime()
        TextRetrieval.indexSave(idxDir,
          TextRetrieval.indexBuild(d, "doc_id", "text"),
          TextRetrieval.corpusStats(d, "text"))
        println(f"[sf1] bm25_index_build_$tag%-12s ${(System.nanoTime() - tB) / 1e9}%7.2f s")
        val idx = TextRetrieval.indexLoad(spark, idxDir)
        // warmup then timed probe
        TextRetrieval.bm25Indexed(idx, "doc_id", queries, "query_id",
          "qtext", k = 10).write.format("noop").mode("overwrite").save()
        timed(s"bm25_probe_$tag")(TextRetrieval.bm25Indexed(
          idx, "doc_id", queries, "query_id", "qtext", k = 10))
      }
      bm25Leg("525k", d525)
      bm25Leg("5m", d10)
      }

      if (decadeAnn) {
      // ANN stored-index batch probes: IVF (k=256) built and SAVED
      // (hive-partitioned by cluster), then a 100-query batch through
      // the LOADED index — probes are partition-pruned scans, so the
      // probe cost must grow ~linearly with rows-per-cell while the
      // build amortizes. Embeddings generated once (5M + 250k exact
      // copies at shifted ids, the sf1 structure).
      import graft.operators.{Ann, Search, SearchConfig}
      if (!new java.io.File(s"$Dir10/_emb_done").exists()) {
        val tE = System.nanoTime()
        val base = spark.range(NDocs10).map { id =>
          val rnd = new java.util.Random(id * 40503L + 7L)
          (id, Array.fill(64)(rnd.nextGaussian().toFloat))
        }.toDF("vec_id", "embedding")
        base.unionByName(
            base.filter($"vec_id" % 20 === 0)
              .select(($"vec_id" + 10000000L).as("vec_id"), $"embedding"))
          .write.mode("overwrite").parquet(s"$Dir10/embeddings.parquet")
        new java.io.File(s"$Dir10/_emb_done").createNewFile()
        println(f"[sf1] decade_emb_gen            ${(System.nanoTime() - tE) / 1e9}%7.2f s")
      }
      val e10 = spark.read.parquet(s"$Dir10/embeddings.parquet")
      val e525 = e10.filter($"vec_id" < 500000L ||
          ($"vec_id" >= 10000000L && $"vec_id" < 10500000L))
        .localCheckpoint(true)
      val cfgA = SearchConfig(
        scoreFuncName = "VectorDistance", higherIsBetter = false, limit = 10,
        featureCol = "embedding", keyCols = Seq("vec_id"),
        tieBreakCol = Some("vec_id"), assumeUniqueKeys = true)
      val probeQs = e10.filter($"vec_id" < 100)
        .select($"vec_id".as(Search.QueryIdCol), $"embedding")
        .localCheckpoint(true)
      // AUTO-SIZED k (r12, the round-11 verdict's `weak` fix): ivfAutoK
      // holds rows-per-cell ~constant across the decade, so the probe
      // batch must stay ~FLAT where the r11 fixed-k=256 leg grew 15.6×;
      // the build's KMeans fit is sample-bounded (IvfAutoFitRows) so it
      // stays ~linear despite k growing with n
      def ivfLeg(tag: String, e: DataFrame, nRows: Long): Unit = {
        val idxDir = s"$Dir10/ivf_${tag}_${java.util.UUID.randomUUID().toString.take(8)}"
        val tB = System.nanoTime()
        val (indexed, cents) = Ann.ivfBuild(e, "embedding", k = -1,
          normalize = false)
        Ann.ivfSave(idxDir, indexed, cents)
        assert(cents.length == Ann.ivfAutoK(nRows),
          s"auto k ${cents.length} != ivfAutoK($nRows)")
        println(f"[sf1] ivf_build_save_$tag%-10s  ${(System.nanoTime() - tB) / 1e9}%7.2f s " +
          s"k=${cents.length} rows/cell=${nRows / cents.length}")
        val (stored, c) = Ann.ivfLoad(spark, idxDir)
        // warmup then timed probe batch
        Ann.ivfMultiSearch(stored, c, probeQs, cfgA, nProbe = 8)
          .write.format("noop").mode("overwrite").save()
        timed(s"ivf_probe100_$tag")(
          Ann.ivfMultiSearch(stored, c, probeQs, cfgA, nProbe = 8))
      }
      ivfLeg("525k", e525, 525000L)
      ivfLeg("5m", e10, 5250000L)
      }

      if (decadeCluster) {
      // --- cluster-state write REBALANCE at the decade (r13, VERDICT r12
      // #5): r12 added `hint("rebalance", cluster)` before the
      // partitionBy(cluster) state writes at a measured +0.9 s LOCAL cost,
      // justified by the ivfSave precedent (~330k tiny files → 29.6 s
      // probes). This leg closes the loop on the CLUSTER writer itself:
      // write the same assigned corpus with and without the hint at 525k
      // and 5.25M rows, and measure write seconds, data-file count, and a
      // partition-pruned one-cluster probe. Assignment is a deterministic
      // hash mod 256 — the fan-out mechanism under test depends only on
      // (input partitions × clusters), not on centroid quality. ---
      import graft.operators.Clustering
      if (!new java.io.File(s"$Dir10/_emb_done").exists()) {
        val tE = System.nanoTime()
        val base = spark.range(NDocs10).map { id =>
          val rnd = new java.util.Random(id * 40503L + 7L)
          (id, Array.fill(64)(rnd.nextGaussian().toFloat))
        }.toDF("vec_id", "embedding")
        base.unionByName(
            base.filter($"vec_id" % 20 === 0)
              .select(($"vec_id" + 10000000L).as("vec_id"), $"embedding"))
          .write.mode("overwrite").parquet(s"$Dir10/embeddings.parquet")
        new java.io.File(s"$Dir10/_emb_done").createNewFile()
        println(f"[sf1] decade_emb_gen            ${(System.nanoTime() - tE) / 1e9}%7.2f s")
      }
      val e10c = spark.read.parquet(s"$Dir10/embeddings.parquet")
      val e525c = e10c.filter($"vec_id" < 500000L ||
          ($"vec_id" >= 10000000L && $"vec_id" < 10500000L))
        .localCheckpoint(true)
      val nClusters = 256
      val cents = (0 until nClusters)
        .map(i => Clustering.Centroid(i, Array.fill(64)(0.0))).toArray
      def dataFiles(dir: String): Int = {
        def walk(f: java.io.File): Int =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getName.endsWith(".parquet")) 1 else 0
        walk(new java.io.File(dir))
      }
      def clusterLeg(tag: String, e: DataFrame): Unit = {
        val assigned = e.select($"vec_id", $"embedding",
          pmod(xxhash64($"vec_id"), lit(nClusters)).cast("int").as("cluster"))
        // WITH the rebalance hint (the shipped clusterSave)
        val dirA = s"$Dir10/cl_hint_${tag}_${java.util.UUID.randomUUID().toString.take(8)}"
        val tA = System.nanoTime()
        Clustering.clusterSave(dirA, assigned, cents)
        val wA = (System.nanoTime() - tA) / 1e9
        println(f"[sf1] cluster_save_hint_$tag%-8s   ${wA}%7.2f s files=${dataFiles(dirA)}")
        // WITHOUT the hint (the pre-r12 write shape, inlined)
        val dirB = s"$Dir10/cl_nohint_${tag}_${java.util.UUID.randomUUID().toString.take(8)}"
        val vB = graft.model.VersionedDir.newVersion()
        val tB = System.nanoTime()
        assigned.write.mode("overwrite").partitionBy("cluster")
          .parquet(s"$dirB/$vB")
        graft.model.VersionedDir.writeSidecar(spark, dirB, "cluster_centroids.csv",
          vB +: cents.map(c => (Seq(c.id.toString, "0") ++
            c.v.map(_.toString)).mkString(",")))
        val wB = (System.nanoTime() - tB) / 1e9
        println(f"[sf1] cluster_save_nohint_$tag%-8s ${wB}%7.2f s files=${dataFiles(dirB)}")
        // partition-pruned one-cluster probe on each layout
        for ((nm, d) <- Seq(("hint", dirA), ("nohint", dirB))) {
          val (st, _) = Clustering.clusterLoad(spark, d)
          timed(s"cluster_probe_${nm}_$tag")(st.filter($"cluster" === 42))
        }
      }
      clusterLeg("525k", e525c)
      clusterLeg("5m", e10c)
      }

      if (decadeLid) {
      // --- trained LID at the decade (r12, VERDICT r11 #5): scoring is
      // one map-side kernel stage, so wall clock must stay ~LINEAR from
      // 525k to 5.25M docs; the LID-keyed dataset card adds one agg
      // exchange whose volume is now 8-byte hash identities + counters
      // (the r12 hash-identity card), measured here at full scale. ---
      {
        import graft.operators.{LangId, LangIdFixture}
        import graft.functions.TextAnalysis._
        val model = LangId.train(
          LangIdFixture.Train.toDF("lang", "text"), "lang", "text", 5, 20000)
        val m = graft.functions.LidKernel.model(model)
        // warmup (JIT + codegen) on a small slice
        LangId.scoreDocs(d525.filter($"doc_id" % 100 === 0), "doc_id",
          "text", model).write.format("noop").mode("overwrite").save()
        timed("lid_score_525k")(
          LangId.scoreDocs(d525, "doc_id", "text", model))
        timed("lid_score_5m")(
          LangId.scoreDocs(d10, "doc_id", "text", model))
        def card(d: DataFrame) = d
          .withColumn("lang_pred",
            graft.functions.LidScoreExpr(col("text"), m).getField("lang_pred"))
          .groupBy("lang_pred").agg(
            count(lit(1)).as("n_docs"),
            sum(tokenCount($"text")).as("total_tokens"),
            sum(when(gopherGate($"text"), 1L).otherwise(0L)).as("gopher_pass"),
            (count(lit(1)) - countDistinct(
              graft.operators.Dedup.tokHash61($"text"))).as("dup_docs"),
            round(avg(qualityScore($"text")), 6).as("avg_quality"))
        timed("lid_card_525k")(card(d525))
        timed("lid_card_5m")(card(d10))
      }
      }

      if (decadeSpm) {
      // --- unigram-LM tokenizer at production vocab scale (r12, VERDICT
      // r11 #6): candCap 32k (real SentencePiece vocabularies are
      // 8-32k) over the 525k corpus. The word-freq agg scans the corpus
      // (the only corpus-sized term); every EM pass is bounded by word
      // TYPES x candidate pieces, so train cost must be ~flat vs the
      // 52.5k rehearsal's +10% corpus-scan term. vocab(8k) and
      // vocab(32k) apply must equal the driver segmenter. ---
      {
        import graft.operators.Spm
        val tTr = System.nanoTime()
        val model = Spm.train(d525, "text", maxWordTypes = 20000,
          maxWordLen = 16, maxPieceLen = 5, candCap = 32000, iters = 2)
        println(f"[sf1] spm_train32k_525k         ${(System.nanoTime() - tTr) / 1e9}%7.2f s pieces=${model.pieces.size}")
        for (vs <- Seq(8000, 32000)) {
          val v = Spm.vocab(model, vs)
          val lp = v.toMap
          timed(s"spm_apply${vs / 1000}k_525k")(
            d525.select($"doc_id", Spm.spmTokenCount($"text", v, 5).as("n")))
          val sample = d525.filter($"doc_id" < 200)
            .select($"doc_id", $"text",
              Spm.spmTokenCount($"text", v, 5).as("n"))
            .as[(Long, String, Long)].collect()
          sample.foreach { case (id, t, n) =>
            val want = graft.functions.TextHash.tokenize(
              org.apache.spark.unsafe.types.UTF8String.fromString(t))
              .map(w => Spm.segmentWord(w, lp, 5).length.toLong).sum
            assert(n == want, s"vocab=$vs doc $id kernel=$n driver=$want")
          }
          println(s"[sf1] spm_apply==driver vocab=$vs on ${sample.length} docs")
        }
      }
      }

      if (decadeLex) {
      // --- stored lexical index maintenance at the decade (r12, VERDICT
      // r11 #8): one append, one compact, and diff-driven sync vs fresh
      // rebuild at 5.25M docs — re-verifying the "sync wins only when
      // removes are rare" guidance where the index is 10x larger. Full
      // postings equality is proven at 525k (retrieval stage); here the
      // sync==fresh check asserts exact stats plus row-identical
      // postings on a 200-term sample (a full two-sided exceptAll over
      // ~2x420M posting rows would dominate the leg's wall clock without
      // adding evidence). ---
      {
        import graft.operators.{SnapshotDiff, TextRetrieval}
        import graft.functions.TextAnalysis
        val idxDir = s"$Dir10/lex_maint_${java.util.UUID.randomUUID().toString.take(8)}"
        var t0 = System.nanoTime()
        TextRetrieval.indexSave(idxDir,
          TextRetrieval.indexBuild(d10, "doc_id", "text"),
          TextRetrieval.corpusStats(d10, "text"))
        println(f"[sf1] lex_build_5m              ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        // append: 1% new docs (delta-sized work by contract)
        val added = spark.range(20000000L, 20052500L).map { id =>
          val rnd = new java.util.Random(id * 2654435761L + 42L)
          (id, (0 until 100).map(_ =>
            s"w${if (rnd.nextBoolean()) rnd.nextInt(200) else rnd.nextInt(20000)}")
            .mkString(" "))
        }.toDF("doc_id", "text")
        t0 = System.nanoTime()
        TextRetrieval.indexAppend(spark, idxDir, added, "doc_id", "text")
        println(f"[sf1] lex_append1pct_5m         ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        // compact: purge 2% (an index-sized rewrite by contract)
        val keep = d10.select("doc_id").unionByName(added.select("doc_id"))
          .filter($"doc_id" % 50 =!= 0)
        t0 = System.nanoTime()
        TextRetrieval.indexCompact(spark, idxDir, keep, "doc_id",
          sweepGraceMs = 0L)
        println(f"[sf1] lex_compact2pct_5m        ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        // diff sync vs fresh rebuild: v2 = 2% removed / 1% changed / 2% added
        val v2 = d10.filter($"doc_id" % 50 =!= 0)
          .withColumn("text", when($"doc_id" % 100 === 1,
            concat($"text", lit(" changed marker token"))).otherwise($"text"))
          .unionByName(added)
        val syncDir = s"$Dir10/lex_sync_${java.util.UUID.randomUUID().toString.take(8)}"
        TextRetrieval.indexSave(syncDir,
          TextRetrieval.indexBuild(d10, "doc_id", "text"),
          TextRetrieval.corpusStats(d10, "text"))
        t0 = System.nanoTime()
        val d2 = SnapshotDiff.diff(d10, v2, "doc_id",
          TextAnalysis.fingerprint($"text")).localCheckpoint(true)
        TextRetrieval.indexRemove(spark, syncDir,
          d2.filter($"status".isin(SnapshotDiff.Removed, SnapshotDiff.Changed))
            .select("doc_id"), "doc_id")
        TextRetrieval.indexAppend(spark, syncDir,
          v2.join(d2.filter($"status".isin(SnapshotDiff.Added, SnapshotDiff.Changed))
            .select("doc_id"), "doc_id"), "doc_id", "text")
        val tSync = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val freshDir = s"$Dir10/lex_fresh_${java.util.UUID.randomUUID().toString.take(8)}"
        TextRetrieval.indexSave(freshDir,
          TextRetrieval.indexBuild(v2, "doc_id", "text"),
          TextRetrieval.corpusStats(v2, "text"))
        val tFresh = (System.nanoTime() - t0) / 1e9
        println(f"[sf1] lex_sync_5m               $tSync%7.2f s vs fresh v2 rebuild $tFresh%7.2f s")
        val synced = TextRetrieval.indexLoad(spark, syncDir)
        val fresh = TextRetrieval.indexLoad(spark, freshDir)
        assert(synced.stats == fresh.stats,
          s"stats diverged: ${synced.stats} vs ${fresh.stats}")
        val terms = (0 until 200).map(i => s"w${i * 97 % 20000}")
        def slice(ix: TextRetrieval.LexIndex) = ix.postings
          .filter($"term".isin(terms: _*))
          .select("term", "doc_id", "__tf", "__dl").localCheckpoint(true)
        val sp = slice(synced); val fp2 = slice(fresh)
        assert(sp.exceptAll(fp2).count() == 0L && fp2.exceptAll(sp).count() == 0L,
          "synced postings != fresh rebuild on the 200-term sample")
        println(s"[sf1] lex_sync_equal_5m         stats exact; 200-term posting sample row-identical")
      }
      }
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    }

    if (spmStage) {
    // --- unigram-LM tokenizer at rehearsal scale (r11): training is
    // one word-freq hash-agg (shuffle = distinct types, capped 20k) +
    // per-iteration ONE broadcast forward–backward pass whose shuffle
    // is candidate pieces (capped); apply is the map-side Viterbi
    // kernel over 52.5k docs — must be flat in vocabulary size and
    // linear in corpus size. ---
    {
      import graft.operators.{Bpe, Spm}
      val tTr = System.nanoTime()
      val m = Spm.train(docs, "text", maxWordTypes = 20000,
        maxWordLen = 16, maxPieceLen = 5, candCap = 30000, iters = 2)
      val trSec = (System.nanoTime() - tTr) / 1e9
      println(f"[sf1] spm_train_20k              $trSec%7.2f s pieces=${m.pieces.size}")
      val v = Spm.vocab(m, 8000)
      val docsSmall = docs.filter($"doc_id" % 10 === 0).localCheckpoint(true)
      // warmup
      docsSmall.select(Spm.spmTokenCount($"text", v, 5))
        .write.format("noop").mode("overwrite").save()
      timed("spm_apply_5k")(
        docsSmall.select($"doc_id", Spm.spmTokenCount($"text", v, 5).as("n")))
      timed("spm_apply_52k")(
        docs.select($"doc_id", Spm.spmTokenCount($"text", v, 5).as("n")))
      // apply == independent driver segmenter on a sample
      val lp = v.toMap
      val sample = docs.filter($"doc_id" < 200)
        .select($"doc_id", $"text",
          Spm.spmTokenCount($"text", v, 5).as("n"))
        .as[(Long, String, Long)].collect()
      sample.foreach { case (id, t, n) =>
        val want = graft.functions.TextHash.tokenize(
          org.apache.spark.unsafe.types.UTF8String.fromString(t))
          .map(w => Spm.segmentWord(w, lp, 5).length.toLong).sum
        assert(n == want, s"doc $id kernel=$n driver=$want")
      }
      println(s"[sf1] spm_apply==driver on ${sample.length} docs")
    }
    }

    if (lidStage) {
    // --- trained char-n-gram language ID at rehearsal scale (r11):
    // the model is fixture-trained (bounded: ≤20k grams × 26 classes);
    // scoring must be ONE gram scan + ONE broadcast join + one per-doc
    // agg, so wall clock must grow ~linearly with corpus size. The
    // 5.25k/52.5k contrast measures that; the plan assert pins the
    // broadcast (a SortMergeJoin here would shuffle the corpus). ---
    {
      import graft.operators.{LangId, LangIdFixture}
      val model = LangId.train(
        LangIdFixture.Train.toDF("lang", "text"), "lang", "text", 5, 20000)
      println(s"[sf1] lid model: vocab=${model.vocabSize} langs=${model.langs.size}")
      val docsSmall = docs.filter($"doc_id" % 10 === 0).localCheckpoint(true)
      val scoredPlan = LangId.scoreDocs(docs, "doc_id", "text", model)
        .queryExecution.executedPlan.toString
      assert(!scoredPlan.contains("Exchange") && !scoredPlan.contains("Join"),
        "lid scoring must be one map-side kernel stage")
      // warmup (JIT, codegen, broadcast machinery)
      LangId.scoreDocs(docsSmall, "doc_id", "text", model)
        .write.format("noop").mode("overwrite").save()
      timed("lid_score_5k")(
        LangId.scoreDocs(docsSmall, "doc_id", "text", model))
      timed("lid_score_52k")(
        LangId.scoreDocs(docs, "doc_id", "text", model))
    }
    }

    if (lmStage) {
    // --- bigram-LM perplexity scoring at rehearsal scale (r9): training
    // is two hash aggs over one tokenized scan family whose shuffle
    // volume is DISTINCT TYPES (20k unigrams / ~1.8M raw bigram types
    // capped to 200k), not tokens; scoring is three broadcast joins plus
    // a per-doc hash agg, so its wall clock must grow ~linearly with
    // corpus size for a fixed model. The 5.25k/52.5k contrast measures
    // both claims on the same vocabulary shape. ---
    {
      import graft.operators.LanguageModel
      val docsSmall = docs.filter($"doc_id" % 10 === 0).localCheckpoint(true)
      println(s"[sf1] lm corpora: small=${docsSmall.count()} full=${docs.count()}")
      // warmup (JIT, codegen, broadcast machinery — the stage runs alone)
      LanguageModel.trainBigram(docsSmall, "text", vocabCap = 10000,
        bigramMinCount = 2, bigramCap = 200000)
      def timedTrain(name: String, d: DataFrame): LanguageModel.BigramLM = {
        val t0 = System.nanoTime()
        val m = LanguageModel.trainBigram(d, "text", vocabCap = 10000,
          bigramMinCount = 2, bigramCap = 200000)
        println(f"[sf1] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s " +
          s"uni=${m.unigrams.size} bi=${m.bigrams.size}")
        m
      }
      timedTrain("lm_train_5k", docsSmall)
      val lm = timedTrain("lm_train_52k", docs)
      assert(lm.unigrams.size <= 10001 && lm.bigrams.size <= 200000,
        s"model exceeds caps: uni=${lm.unigrams.size} bi=${lm.bigrams.size}")

      // the scoring plan must be broadcast-only: three BroadcastHashJoins
      // against the local model, no sort-merge join anywhere
      val plan = LanguageModel.scoreDocs(docs, "doc_id", "text", lm)
        .queryExecution.executedPlan.toString
      val nBhj = "BroadcastHashJoin".r.findAllIn(plan).size
      assert(nBhj >= 3 && !plan.contains("SortMergeJoin"),
        s"scoring plan not broadcast-only: bhj=$nBhj smj=${plan.contains("SortMergeJoin")}")
      println(s"[sf1] lm_score plan             bhj=$nBhj smj=none")

      // score-path warmup (collect_list/fold codegen is distinct from the
      // training plan's) so the 5k number isn't half JIT
      LanguageModel.scoreDocs(docsSmall, "doc_id", "text", lm)
        .write.format("noop").mode("overwrite").save()
      timed("lm_score_5k")(
        LanguageModel.scoreDocs(docsSmall, "doc_id", "text", lm))
      timed("lm_score_52k")(
        LanguageModel.scoreDocs(docs, "doc_id", "text", lm))
      val t0 = System.nanoTime()
      val scored = LanguageModel.scoreDocs(docs, "doc_id", "text", lm)
      val kept = LanguageModel.perplexityKeep(scored, "doc_id", 0.8)
      val nKept = kept.count()
      println(f"[sf1] lm_keep80_52k             ${(System.nanoTime() - t0) / 1e9}%7.2f s " +
        s"kept=$nKept")

      // --- distributed threshold selection at 525k (r10, VERDICT r9 #1):
      // the r9 rank cut ran as TakeOrderedAndProject — a single task
      // materializing O(keep) rows, keep ∝ corpus. The selection path's
      // per-task and driver footprint is bounded by localLimit (65,536
      // doubles here ≈ 0.5 MB) REGARDLESS of keep; near-equal wall
      // clocks across keepFrac 0.5 / 0.9 are the keep-independence
      // evidence, and each cut is asserted row-identical to the rank-cut
      // reference. Scores collide 525× per value (id % 1000), so every
      // boundary falls inside a tie mass and the id tie-cut exercises at
      // scale. ---
      val scored525 = spark.range(525000L)
        .select($"id".as("doc_id"), lit(100).as("n_tok"), lit(0d).as("logprob"),
          (($"id" % 1000L).cast("double") / 1000.0).as("avg_logprob"))
        .localCheckpoint(true)
      for (frac <- Seq(0.5, 0.9)) {
        val tS = System.nanoTime()
        val cut = LanguageModel.perplexityKeep(scored525, "doc_id", frac,
          localLimit = 65536)
        val nCut = cut.count()
        val sSec = (System.nanoTime() - tS) / 1e9
        val expectN = math.ceil(frac * 525000L).toLong
        assert(nCut == expectN, s"keep$frac kept $nCut, want $expectN")
        val ref = scored525.orderBy(desc("avg_logprob"), asc("doc_id"))
          .limit(expectN.toInt)
        val missing = ref.select("doc_id")
          .exceptAll(cut.select("doc_id")).count()
        assert(missing == 0L,
          s"selection cut diverges from the rank cut by $missing rows at keep=$frac")
        println(f"[sf1] lm_sel_keep${(frac * 100).toInt}_525k          $sSec%7.2f s " +
          s"kept=$nCut == rank cut")
      }

      // grouped selection at 525k / 20 groups (r10 cont.): every group's
      // threshold found simultaneously — a handful of grid+count passes
      // TOTAL, vs a per-group single-task window sort; asserted
      // row-identical to the per-group rank cut (window reference is
      // fine at this size, it is exactly what does not scale)
      val grouped525 = scored525
        .withColumn("lang", concat(lit("g"), (col("doc_id") % 20L).cast("string")))
        .localCheckpoint(true)
      val tG = System.nanoTime()
      val gcut = graft.operators.Selection.topFracByGroup(
        grouped525, "lang", "avg_logprob", "doc_id", 0.6,
        localTotalLimit = 65536)
      val nG = gcut.count()
      val gSec = (System.nanoTime() - tG) / 1e9
      val wRef = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(desc("avg_logprob"), asc("doc_id"))
      val refG = grouped525
        .withColumn("__rn", row_number().over(wRef))
        .withColumn("__n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
        .where(col("__rn") <= ceil(lit(0.6) * col("__n")))
      val gMissing = refG.select("doc_id").exceptAll(gcut.select("doc_id")).count()
      assert(nG == refG.count() && gMissing == 0L,
        s"grouped cut diverges: n=$nG missing=$gMissing")
      println(f"[sf1] lm_sel_grouped_525k         $gSec%7.2f s " +
        s"kept=$nG over 20 groups == per-group rank cut")

      // in-run invariant at realistic vocab: the engine's fold equals a
      // driver-side plain-Scala Stupid-Backoff replay on sampled docs
      val uniM = lm.unigrams.toMap
      val biM = lm.bigrams.map { case (a, b, c) => ((a, b), c) }.toMap
      val sampleIds = Seq(3L, 1007L, 25013L, 49999L, 10000060L)
      val gotRows = scored.filter($"doc_id".isin(sampleIds: _*))
        .select($"doc_id", $"n_tok", $"logprob").collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
      val texts = docs.filter($"doc_id".isin(sampleIds: _*))
        .select($"doc_id", $"text").as[(Long, String)].collect().toMap
      sampleIds.foreach { id =>
        val ts = graft.functions.TextHash.WS.split(texts(id).toLowerCase)
          .toSeq.filter(_.nonEmpty)
        val lp = ts.zipWithIndex.map { case (w, i) =>
          val cuc = uniM.getOrElse(w, lm.unkCount).toDouble
          if (i == 0) math.log(cuc / lm.totalTokens)
          else {
            val wp = ts(i - 1)
            val mp = if (uniM.contains(wp)) wp else LanguageModel.Unk
            val mc = if (uniM.contains(w)) w else LanguageModel.Unk
            biM.get((mp, mc)) match {
              case Some(cb) => math.log(
                cb.toDouble / uniM.getOrElse(wp, lm.unkCount).toDouble)
              case None => math.log(
                LanguageModel.Alpha * (cuc / lm.totalTokens))
            }
          }
        }.foldLeft(0d)(_ + _)
        val (gn, glp) = gotRows(id)
        assert(gn == ts.size && math.abs(glp - lp) < 1e-9,
          s"doc $id diverged: engine ($gn, $glp) vs replay (${ts.size}, $lp)")
      }
      println(s"[sf1] lm_fold==replay           docs=${sampleIds.size}")

      // fixed-vocabulary maintenance: three 2.5k-doc updates against the
      // 7.5k-doc model (the base where the 4M bigram cap provably never
      // binds, so the no-loss settings are real); each update must cost
      // a fraction of retrain, and update(base ∪ batches) == retrain
      // must hold exactly at the realistic 20k-word vocabulary
      val lmFull = graft.operators.LanguageModel.trainBigram(
        docsSmall, "text", vocabCap = 25000, bigramMinCount = 1,
        bigramCap = 4000000)
      var lmUpd = lmFull
      var grown = docsSmall.toDF()
      def updText(id: Long): String = {
        val rnd = new java.util.Random(id * 2654435761L + 42L)
        val n = 80 + rnd.nextInt(40)
        val sb = new StringBuilder
        var i = 0
        while (i < n) {
          val w = if (rnd.nextBoolean()) rnd.nextInt(200) else rnd.nextInt(20000)
          if (i > 0) sb += ' '
          sb ++= "w"; sb ++= w.toString
          i += 1
        }
        sb.result()
      }
      for (b <- 1 to 3) {
        val lo = 30000000L + (b - 1) * 2500L
        val batch = spark.range(lo, lo + 2500L)
          .map(id => (id, updText(id % 1000000))).toDF("doc_id", "text")
          .localCheckpoint(true)
        val tU = System.nanoTime()
        lmUpd = graft.operators.LanguageModel.lmUpdate(lmUpd, batch, "text",
          bigramCap = 4000000)
        val uSec = (System.nanoTime() - tU) / 1e9
        grown = grown.unionByName(batch)
        println(f"[sf1] lm_update_b$b               $uSec%7.2f s " +
          s"N=${lmUpd.totalTokens} bi=${lmUpd.bigrams.size}")
      }
      val tR = System.nanoTime()
      val lmRe = graft.operators.LanguageModel.trainBigram(
        grown, "text", vocabCap = 25000, bigramMinCount = 1,
        bigramCap = 4000000)
      println(f"[sf1] lm_retrain_15k              ${(System.nanoTime() - tR) / 1e9}%7.2f s")
      assert(lmUpd.unigrams.toMap == lmRe.unigrams.toMap &&
        lmUpd.bigrams.toSet == lmRe.bigrams.toSet &&
        lmUpd.totalTokens == lmRe.totalTokens &&
        lmUpd.unkCount == lmRe.unkCount,
        "sequential updates must equal retrain under the no-loss settings")
      println(s"[sf1] lm_update==retrain         uni=${lmUpd.unigrams.size} bi=${lmUpd.bigrams.size}")

      // --- generic order-5 at rehearsal scale (r10): training adds one
      // slide→explode→hash-agg per order (each shuffle = distinct gram
      // types, capped at 200k); the scoring plan must stay broadcast-only
      // with 12 model joins (5 unigram + 4 gram + 3 context) — the
      // CCNet 5-gram shape at a realistic vocabulary. ---
      val t5 = System.nanoTime()
      val m5 = graft.operators.NgramLm.train(docs, "text", order = 5,
        vocabCap = 10000, minCount = 2, tableCap = 200000)
      println(f"[sf1] lm5_train_52k             ${(System.nanoTime() - t5) / 1e9}%7.2f s " +
        s"tables=${(2 to 5).map(n => m5.tables(n - 2).size).mkString("/")}")
      val plan5 = graft.operators.NgramLm.scoreDocs(docs, "doc_id", "text", m5)
        .queryExecution.executedPlan.toString
      val nBhj5 = "BroadcastHashJoin".r.findAllIn(plan5).size
      assert(nBhj5 >= 12 && !plan5.contains("SortMergeJoin"),
        s"order-5 scoring not broadcast-only: bhj=$nBhj5")
      println(s"[sf1] lm5_score plan            bhj=$nBhj5 smj=none")
      graft.operators.NgramLm.scoreDocs(docsSmall, "doc_id", "text", m5)
        .write.format("noop").mode("overwrite").save() // warm the shape
      timed("lm5_score_52k")(
        graft.operators.NgramLm.scoreDocs(docs, "doc_id", "text", m5))
    }
    }

    if (clusterStage) {
    // --- clustering + semantic gate at 52.5k embeddings (r9 cont. 2):
    // assign/lloyd are map-only + one partial-agg shuffle; semDedup is
    // within-cluster pairs (k=256 → occupancy ~205, ~10.7M comparisons);
    // the gate's per-batch cost is |batch| × occupancy of TOUCHED
    // clusters — random batches touch every cluster, so the honest
    // statement is cost ∝ occupancy, which grows with corpus unless k
    // grows with it; the per-batch timings below print that slope. The
    // 5% planted exact copies (vec_id+10000000) must dedup/reject at
    // cosine exactly 1; novel gaussians sit ≥7σ from the 0.95 threshold
    // (64-dim cosine σ≈0.125), so admissions are deterministic. ---
    {
      val runTag = java.util.UUID.randomUUID().toString.take(8)
      val stateDir = s"$Dir/cluster_state_$runTag"
      val base = emb.filter($"vec_id" < 10000000L)  // 50k originals
      val seeded = base.withColumn("grp", ($"vec_id" % 256).cast("int"))
      val t0 = System.nanoTime()
      val cents = graft.operators.Clustering.groupCentroids(seeded, "grp", "embedding")
      println(f"[sf1] cluster_seed_means_50k      ${(System.nanoTime() - t0) / 1e9}%7.2f s k=${cents.length}")
      timed("cluster_assign_52k")(
        graft.operators.Clustering.assign(emb, cents, "embedding"))
      val tL = System.nanoTime()
      val ll = graft.operators.Clustering.lloyd(base, cents, "embedding", iters = 2)
      ll.assigned.write.format("noop").mode("overwrite").save()
      println(f"[sf1] cluster_lloyd2_50k          ${(System.nanoTime() - tL) / 1e9}%7.2f s")
      val tS = System.nanoTime()
      val dd = graft.operators.Clustering.semDedup(emb, cents, "vec_id",
        "embedding", threshold = 0.95)
      val nKept = dd.count()
      println(f"[sf1] cluster_semdedup_52k        ${(System.nanoTime() - tS) / 1e9}%7.2f s kept=$nKept")
      // every one of the 2,500 planted copies (cosine exactly 1 against
      // its original, same cluster by identical distance vector) drops;
      // natural pairs sit ≥7σ under 0.95 — kept must be exactly the 50k
      assert(nKept == 50000L, s"semdedup kept $nKept, expected 50000")

      // gate + append maintenance: corpus = first 40k originals; three
      // batches of 2,500 novel + 500 planted copies of corpus rows
      val corpus0 = base.filter($"vec_id" < 40000L)
      val assigned0 = graft.operators.Clustering
        .assign(corpus0, cents, "embedding").drop("dist")
      graft.operators.Clustering.clusterSave(stateDir, assigned0, cents)
      for (b <- 1 to 3) {
        val lo = 40000L + (b - 1) * 2500L
        val novel = base.filter($"vec_id" >= lo && $"vec_id" < lo + 2500L)
        val copies = base.filter($"vec_id" % 20 === 0 && $"vec_id" < 10000L)
          .limit(500)
          .withColumn("vec_id", $"vec_id" + (20000000L + b * 100000L))
        val batch = novel.unionByName(copies)
        val st = graft.operators.Clustering.clusterLoadState(spark, stateDir)
        val tA = System.nanoTime()
        val admitted = graft.operators.Clustering.admitSemantic(batch,
          st.assigned, st.centroids, "vec_id", "embedding", threshold = 0.95)
          .localCheckpoint(true)
        val aSec = (System.nanoTime() - tA) / 1e9
        val ids = admitted.select("vec_id").as[Long].collect().toSet
        assert(ids == (lo until lo + 2500L).toSet,
          s"batch $b admitted ${ids.size} (copies leaked: ${ids.count(_ >= 20000000L)})")
        val tP = System.nanoTime()
        val st2 = graft.operators.Clustering.clusterAppend(spark, stateDir,
          admitted)
        val pSec = (System.nanoTime() - tP) / 1e9
        assert(st2.counts.values.sum == 40000L + b * 2500L,
          s"batch $b counts ${st2.counts.values.sum}")
        println(f"[sf1] gate_admit_b$b               $aSec%7.2f s  append $pSec%7.2f s " +
          s"state=${st2.counts.values.sum}")
      }

      // compact + quantizer refresh over the grown 47.5k state: centroids
      // become the kept rows' cluster means and EVERY row reassigns —
      // assert the restored invariant (stored cluster == argmin current
      // centroids) holds for all rows, and that a fresh copy batch still
      // rejects fully against the refreshed state
      val tC = System.nanoTime()
      val refreshed = graft.operators.Clustering.clusterCompact(
        spark, stateDir, refresh = true)
      val cSec = (System.nanoTime() - tC) / 1e9
      val inconsistent = graft.operators.Clustering.assign(
          refreshed.assigned.withColumnRenamed("cluster", "stored"),
          refreshed.centroids, "embedding")
        .filter($"stored" =!= $"cluster").count()
      assert(inconsistent == 0L, s"$inconsistent rows inconsistent after refresh")
      val postCopies = base.filter($"vec_id" % 20 === 0 && $"vec_id" < 10000L)
        .limit(500).withColumn("vec_id", $"vec_id" + 30000000L)
      val postAdmit = graft.operators.Clustering.admitSemantic(postCopies,
        refreshed.assigned, refreshed.centroids, "vec_id", "embedding",
        threshold = 0.95).count()
      assert(postAdmit == 0L, s"$postAdmit copies leaked after refresh")
      println(f"[sf1] gate_compact_refresh        $cSec%7.2f s " +
        s"state=${refreshed.counts.values.sum} consistent, copies reject")
    }
    }

    if (curationStage) {
    // --- composed streaming-curation chain at scale (r9 cont. 2): the
    // per-batch cost of clean → Gopher → LM gate → lexical gate →
    // semantic gate against 40k+ state, measured per phase as the state
    // grows. Every planted reject is CERTAIN (exact text copies, exact
    // embedding copies, all-OOV gibberish far under the threshold), so
    // the admitted sets are asserted exactly — a composition-level
    // correctness check at rehearsal scale, not just a timing. ---
    {
      import graft.operators.{Clustering, Dedup, LanguageModel, QualityClassifier}
      import graft.streaming.{CurationPipeline, StreamingDedup}
      val runTag = java.util.UUID.randomUUID().toString.take(8)
      val clDir = s"$Dir/curation_cl_$runTag"
      val rows = docs.join(emb, docs("doc_id") === emb("vec_id"))
        .select(docs("doc_id"), $"text", $"embedding")
      // state grows PAST 100k (r10, VERDICT r9 #7): 40k in-distribution
      // rows plus 60k generator rows at shifted ids — the generators are
      // pure functions of id, so text and embeddings are distinct and
      // every per-phase gate below runs against a six-figure state
      def stateText(id: Long): String = {
        val rnd = new java.util.Random(id * 2654435761L + 42L)
        val n = 80 + rnd.nextInt(40)
        val sb = new StringBuilder
        var i = 0
        while (i < n) {
          val w = if (rnd.nextBoolean()) rnd.nextInt(200) else rnd.nextInt(20000)
          if (i > 0) sb += ' '
          sb ++= "w"; sb ++= w.toString
          i += 1
        }
        sb.result()
      }
      val extraState = spark.range(300000L, 360000L).map { id =>
        val rnd = new java.util.Random(id * 40503L + 7L)
        (id, stateText(id), Array.fill(64)(rnd.nextGaussian().toFloat))
      }.toDF("doc_id", "text", "embedding")
      val corpus0 = rows.filter($"doc_id" < 40000L)
        .unionByName(extraState).localCheckpoint(true)
      println(s"[sf1] curation state0=${corpus0.count()}")

      // FULL vocabulary (cap not binding): a cap that swallows the Zipf
      // tail into unk gives unk ~25% of the probability mass, and an
      // all-OOV document then scores BETTER than real text — the gate
      // premise needs a thin unk (caps are exercised by the lm stage and
      // the oracle queries; here the gate semantics are the subject)
      val lm = LanguageModel.trainBigram(
        corpus0.filter($"doc_id" < 10000L), "text",
        vocabCap = 20000, bigramMinCount = 2)
      val cents = Clustering.groupCentroids(
        corpus0.withColumn("grp", ($"doc_id" % 256).cast("int")),
        "grp", "embedding")
      Clustering.clusterSave(clDir,
        Clustering.assign(corpus0, cents, "embedding").drop("dist"), cents)
      var lexCorpus = corpus0.select($"doc_id", $"text")
      var lexKeys = Dedup.minhashBandKeys(lexCorpus, "doc_id", "text")
        .localCheckpoint(true)

      // LM threshold: 0.5 under the GLOBAL min over every in-distribution
      // doc any phase will see — every legitimate doc passes by
      // construction, and all-OOV gibberish (unk mass ~1/N with the full
      // vocab) sits several nats below
      val sampleMin = LanguageModel.scoreDocs(
          rows.filter($"doc_id" < 48600L), "doc_id", "text", lm)
        .agg(min($"avg_logprob")).head.getDouble(0)
      val gibScore = LanguageModel.scoreDocs(
          Seq((0L, (1 to 90).map(i => s"zz$i").mkString(" ")))
            .toDF("doc_id", "text"), "doc_id", "text", lm)
        .head.getDouble(3)
      println(f"[sf1] curation lm margin          sample_min=$sampleMin%.3f gib=$gibScore%.3f")
      assert(gibScore < sampleMin - 2.0, "gibberish must sit far below the corpus floor")

      // NB discriminative gate (r10): bad class = hot-token spam — 60
      // tokens drawn from w0..w9 only, i.e. fully inside the LM
      // vocabulary and built of corpus-frequent bigrams, so spam PASSES
      // the perplexity gate (asserted below) and only the discriminative
      // gate can reject it: the two quality families are complementary,
      // not redundant, in this chain
      def spamText(id: Long): String = {
        val rnd = new java.util.Random(id * 7919L + 3L)
        (0 until 60).map(_ => s"w${rnd.nextInt(10)}").mkString(" ")
      }
      val spamCorpus = spark.range(5000L).map(id => (id, spamText(id)))
        .toDF("doc_id", "text")
      val nb = QualityClassifier.trainNb(
        corpus0.filter($"doc_id" < 10000L).select($"doc_id", $"text"),
        spamCorpus, "text", vocabCap = 5000)
      val nbFloor = QualityClassifier.scoreDocs(
          rows.filter($"doc_id" < 48600L), "doc_id", "text", nb)
        .agg(min($"avg_logodds")).head.getDouble(0)
      val spamProbe = spark.range(250L)
        .map(i => (i, spamText(90000000L + i))).toDF("doc_id", "text")
      val spamStats = QualityClassifier.scoreDocs(
          spamProbe, "doc_id", "text", nb)
        .agg(max($"avg_logodds")).head.getDouble(0)
      val spamLmMin = LanguageModel.scoreDocs(spamProbe, "doc_id", "text", lm)
        .agg(min($"avg_logprob")).head.getDouble(0)
      println(f"[sf1] curation nb margin          floor=$nbFloor%.3f spam_max=$spamStats%.3f " +
        f"spam_lm_min=$spamLmMin%.3f")
      assert(spamStats < nbFloor - 1.0,
        "spam must sit clearly below the in-distribution log-odds floor")
      assert(spamLmMin >= sampleMin - 0.5,
        "spam must PASS the perplexity gate — otherwise the NB assertion is vacuous")

      // DSIR target-distribution gate (r10 cont.): off-target = TAIL-ONLY
      // vocabulary draws — in-vocab for the LM (asserted to pass the
      // perplexity floor), benign for NB (asserted to pass the log-odds
      // floor), novel for both dedup gates; ONLY the importance gate
      // separates distributionally-shifted text. The converse holds too:
      // spam is head-only (target-heavy buckets → passes DSIR, dies at
      // NB) and gibberish is OOV (ratio ln(Nr+αB)−ln(Nt+αB) > 0 →
      // passes DSIR, dies at LM) — four quality gates, four DISJOINT
      // reject families.
      // the corpus' own 50/50 head/tail draw structure — so the LM sees
      // ordinary transitions and perplexity stays in-range — but with
      // the tail NARROWED to a 40-word band: per-token statistics match
      // the corpus (band words are ordinary ~120-count vocabulary), the
      // joint distribution does not — the off corpus concentrates ~4,400
      // occurrences on each band word where the target carries ~120, and
      // hashed gram mass must CONCENTRATE relative to the bucket space
      // to be detectable (a first cut with a 2,000-word band measured
      // NO separation: its 4M-pair bigram space hash-spread uniformly
      // over 8,192 buckets, shifting every ratio equally — the same
      // concentration bound that governs the NB spam family)
      def offText(id: Long): String = {
        val rnd = new java.util.Random(id * 104729L + 11L)
        (0 until 70).map { _ =>
          val w = if (rnd.nextBoolean()) rnd.nextInt(200)
            else 5000 + rnd.nextInt(40)
          s"w$w"
        }.mkString(" ")
      }
      val offCorpus = spark.range(5000L).map(id => (id, offText(id)))
        .toDF("doc_id", "text")
      val dsirTarget = graft.operators.Dsir.fit(
        corpus0.filter($"doc_id" < 10000L), "text")
      val dsirRaw = graft.operators.Dsir.merge(dsirTarget,
        graft.operators.Dsir.fit(offCorpus, "text"))
      val dsirRatios = graft.operators.Dsir.logRatios(dsirTarget, dsirRaw)
      val inFloor = graft.operators.Dsir.scoreDocs(
          rows.filter($"doc_id" < 48600L).select($"doc_id", $"text"),
          "text", dsirRatios)
        .agg(min($"logw")).head.getDouble(0)
      val offProbe = spark.range(250L)
        .map(i => (i, offText(95000000L + i))).toDF("doc_id", "text")
      val offMax = graft.operators.Dsir.scoreDocs(offProbe, "text", dsirRatios)
        .agg(max($"logw")).head.getDouble(0)
      val offLmMin = LanguageModel.scoreDocs(offProbe, "doc_id", "text", lm)
        .agg(min($"avg_logprob")).head.getDouble(0)
      val offNbMin = QualityClassifier.scoreDocs(offProbe, "doc_id", "text", nb)
        .agg(min($"avg_logodds")).head.getDouble(0)
      println(f"[sf1] curation dsir margin        in_floor=$inFloor%.3f " +
        f"off_max=$offMax%.3f off_lm_min=$offLmMin%.3f off_nb_min=$offNbMin%.3f")
      assert(offMax < inFloor - 1.0,
        "off-target must sit clearly below the in-distribution importance floor")
      assert(offLmMin >= sampleMin - 0.5,
        "off-target must PASS the perplexity gate — otherwise the DSIR assertion is vacuous")
      assert(offNbMin >= nbFloor - 0.5,
        "off-target must PASS the NB gate — otherwise the DSIR assertion is vacuous")

      val cfg = CurationPipeline.CurationConfig(
        gopher = Some(graft.functions.TextAnalysis.GopherThresholds(
          minWords = 50, maxWords = 1000, minMeanWordLen = 1,
          maxMeanWordLen = 12, maxSymbolWordRatio = 1,
          minAlphaWordFrac = 0.3, minStopwordHits = 0)),
        minAvgLogprob = Some(sampleMin - 0.5),
        minDsirLogw = Some(inFloor - 0.5),
        minAvgLogodds = Some(nbFloor - 0.5),
        lexical = Some(StreamingDedup.DedupGateConfig("doc_id", "text",
          n = 3, bands = 4, threshold = 0.5)),
        semanticThreshold = Some(0.95))

      var admittedAll: DataFrame = null
      for (b <- 1 to 3) {
        val lo = 40000L + (b - 1) * 2500L
        val novel = rows.filter($"doc_id" >= lo && $"doc_id" < lo + 2500L)
        // exact text copies of corpus rows → certain lexical rejects
        val textCopies = corpus0.filter($"doc_id" < 250L)
          .select(($"doc_id" + 50000000L + b * 100000L).as("doc_id"),
            $"text", $"embedding")
        // exact embedding copies of corpus rows paired with text that is
        // in-vocabulary but NEVER admitted (ids 48100+ sit outside the
        // corpus and every phase's novel range) → they pass the LM and
        // lexical gates and die at the semantic gate
        val embCopies = corpus0.filter($"doc_id" < 250L)
          .select($"doc_id", $"embedding").withColumn("r", $"doc_id" + 48100L)
          .join(rows.select($"doc_id".as("r"), $"text".as("t2")), Seq("r"))
          .select(($"doc_id" + 60000000L + b * 100000L).as("doc_id"),
            $"t2".as("text"), $"embedding")
        val gibVec = typedLit(
          emb.filter($"vec_id" === 0L).select($"embedding").head.getSeq[Float](0))
        val gib = spark.range(250)
          .select(($"id" + 70000000L + b * 100000L).as("doc_id"),
            lit((1 to 90).map(i => s"zz$i").mkString(" ")).as("text"),
            gibVec.as("embedding"))
        // hot-token spam with NOVEL embeddings: passes Gopher + LM +
        // lexical + semantic — only the NB gate can reject it
        val spam = spark.range(250L).map { i =>
          val id = 80000000L + b * 100000L + i
          val rnd = new java.util.Random(id * 31L + 9L)
          (id, spamText(id), Array.fill(64)(rnd.nextGaussian().toFloat))
        }.toDF("doc_id", "text", "embedding")
        // tail-vocabulary off-target with novel embeddings: passes
        // Gopher + LM + NB + lexical + semantic — only the DSIR gate
        // can reject it
        val offTarget = spark.range(250L).map { i =>
          val id = 90000000L + b * 100000L + i
          val rnd = new java.util.Random(id * 53L + 13L)
          (id, offText(id), Array.fill(64)(rnd.nextGaussian().toFloat))
        }.toDF("doc_id", "text", "embedding")
        val batch = novel.unionByName(textCopies).unionByName(embCopies)
          .unionByName(gib).unionByName(spam).unionByName(offTarget)
          .localCheckpoint(true)

        val st = Clustering.clusterLoadState(spark, clDir)
        val t0 = System.nanoTime()
        val r = CurationPipeline.curateBatch(batch, cfg,
          CurationPipeline.CurationState(
            lm = Some(lm),
            nb = Some(nb),
            dsir = Some(dsirRatios),
            lexCorpus = Some((lexCorpus, lexKeys)),
            cluster = Some((st.assigned, st.centroids))),
          audit = true)
        val admitted = r.admitted.localCheckpoint(true)
        val ids = admitted.select("doc_id").as[Long].collect().toSet
        val sec = (System.nanoTime() - t0) / 1e9
        assert(ids == (lo until lo + 2500L).toSet,
          s"phase $b admitted ${ids.size}: " +
            s"copies=${ids.count(_ >= 50000000L)} " +
            s"spam=${ids.count(id => id >= 80000000L && id < 90000000L)} " +
            s"offtarget=${ids.count(_ >= 90000000L)} expected pure novel")
        // the rejection ledger: one row per rejected doc, and every
        // planted family lands on ITS stage — five families, five
        // disjoint reasons (the audit contract, asserted per phase)
        val rej = r.rejects.get
          .select($"doc_id", $"stage").as[(Long, String)].collect()
        assert(rej.map(_._1).distinct.length == rej.length,
          "ledger must hold exactly one row per rejected doc")
        assert(rej.map(_._1).toSet ==
          batch.select("doc_id").as[Long].collect().toSet -- ids,
          "ledger + admitted must partition the batch")
        val expect = Seq(
          50000000L -> CurationPipeline.StageLexical,
          60000000L -> CurationPipeline.StageSemantic,
          70000000L -> CurationPipeline.StageLm,
          80000000L -> CurationPipeline.StageNb,
          90000000L -> CurationPipeline.StageDsir)
        expect.foreach { case (base, stage) =>
          val fam = rej.filter(x => x._1 >= base && x._1 < base + 10000000L)
          assert(fam.length == 250 && fam.forall(_._2 == stage),
            s"family at $base: ${fam.groupBy(_._2).view.mapValues(_.length).toMap} want 250×$stage")
        }
        admittedAll = admittedAll match {
          case null => admitted
          case acc => acc.unionByName(
            admitted.select(acc.columns.map(col): _*)).localCheckpoint(true)
        }
        lexCorpus = lexCorpus.unionByName(admitted.select("doc_id", "text"))
        r.lexKeys.foreach(k =>
          lexKeys = lexKeys.unionByName(k).localCheckpoint(true))
        r.assigned.foreach(a =>
          Clustering.clusterAppend(spark, clDir, a.localCheckpoint(true)))
        println(f"[sf1] curation_phase_b$b           $sec%7.2f s " +
          s"admitted=${ids.size}/${4250} state=${100000 + b * 2500}")
      }

      // --- packed-output stage (r10): the admitted stream lays out into
      // fixed 1,024-token training sequences keyed on BPE subword counts
      // computed through the KERNEL dispatch (a 10,200-entry merge list —
      // the realistic-vocabulary apply path inside the composed chain).
      // Coverage and capacity are asserted: every admitted doc lands in
      // exactly one bin and no bin exceeds seqLen. ---
      {
        import graft.operators.{Bpe, Packing}
        val tM = System.nanoTime()
        val wfC = Bpe.wordFreq(corpus0, "text", maxWordTypes = 20000)
        val mC = Bpe.trainMerges(wfC, numMerges = 200) ++
          (0 until 10000).map(i => (s"X$i", s"Y$i"))
        println(f"[sf1] curation_bpe_train          ${(System.nanoTime() - tM) / 1e9}%7.2f s merges=${mC.size}")
        val tP = System.nanoTime()
        val counted = admittedAll
          .select($"doc_id", Bpe.bpeTokenCount($"text", mC).as("n_bpe"))
          .localCheckpoint(true)
        val packed = Packing.ffd(counted, "doc_id", "n_bpe",
          seqLen = 1024, shards = 8).localCheckpoint(true)
        val pSec = (System.nanoTime() - tP) / 1e9
        val nDocs = counted.count()
        assert(packed.count() == nDocs,
          s"packing covers ${packed.count()} of $nDocs admitted docs")
        val overCap = packed.groupBy("bin")
          .agg(sum($"n_tokens").as("fill")).filter($"fill" > 1024).count()
        assert(overCap == 0L, s"$overCap bins exceed seqLen")
        val fillRow = packed.groupBy("bin").agg(sum($"n_tokens").as("fill"))
          .agg(count(lit(1)), avg($"fill")).head
        println(f"[sf1] curation_pack_ffd           $pSec%7.2f s docs=$nDocs " +
          f"bins=${fillRow.getLong(0)} avg_fill=${fillRow.getDouble(1)}%.0f/1024")
      }

      // --- DSIR budget draw (r10 cont. 4): the admitted stream cut to a
      // training budget by importance resampling toward the
      // in-distribution slice — the THIRD selection family composed into
      // the chain (after the LM gate and the NB gate). Scoring is
      // map-only against the live admitted frame; the draw is asserted
      // row-identical to the Gumbel rank cut. ---
      {
        import graft.operators.Dsir
        val tD = System.nanoTime()
        val target = Dsir.fit(corpus0.filter($"doc_id" < 10000L), "text")
        val raw = Dsir.fit(admittedAll, "text")
        val scoredA = Dsir.scoreDocs(
          admittedAll.select($"doc_id", $"text"), "text",
          Dsir.logRatios(target, raw)).localCheckpoint(true)
        val sel = Dsir.resample(scoredA, "doc_id", "logw", 5000L)
        val nSel = sel.count()
        val dSec = (System.nanoTime() - tD) / 1e9
        assert(nSel == 5000L, s"budget draw kept $nSel, want 5000")
        val ref = scoredA
          .withColumn("__k", $"logw" + Dsir.gumbelNoise($"doc_id"))
          .orderBy(desc("__k"), asc("doc_id")).limit(5000)
        assert(ref.select("doc_id").exceptAll(sel.select("doc_id")).count() == 0L,
          "budget draw diverges from the rank cut")
        println(f"[sf1] curation_dsir_budget        $dSec%7.2f s kept=$nSel/7500")
      }
    }
    }

    if (rpStage) {
    // --- random-projection ANN at 52.5k 64-dim embeddings (r10). Two
    // honest regimes, both measured: on this STRUCTURE-FREE gaussian
    // corpus all pairwise distances concentrate and the tiny neighbor
    // gaps drown in the projection distortion (ε ≈ √(ln n / projDim)),
    // so recall is LOW and FLAT across projDim 8→32 — the same finding
    // the LSH stage recorded (~0.23: nothing beats a gapless corpus; the
    // corpus, not the dial, binds). On a CLUSTERED corpus of the same
    // size/dim, where gaps exist, recall
    // at modest projDim is near-perfect. Cost: the batch path's flop
    // reduction is real on both (projDim dims per pair instead of 64);
    // the single-query path pays the interpreted projection HOF over
    // one scan and is NOT the win — batches are. ---
    {
      import graft.operators.{Ann, Search, SearchConfig}
      val cfg = SearchConfig(
        scoreFuncName = "VectorDistance", higherIsBetter = false, limit = 10,
        featureCol = "embedding", keyCols = Seq("vec_id"),
        tieBreakCol = Some("vec_id"), assumeUniqueKeys = true)
      val qv = emb.filter($"vec_id" === 1L).select("embedding")
        .head.getSeq[Float](0)
      // warmup
      Ann.rpSearch(emb, qv, cfg, projDim = 8, refine = 4)
        .write.format("noop").mode("overwrite").save()
      timed("rp_exact_52k")(Search.search(emb, qv, cfg))
      timed("rp_knn_52k")(Ann.rpSearch(emb, qv, cfg, projDim = 8, refine = 4))
      // stored projections (the sq8-codes analog): the per-scan
      // projection HOF disappears and the shortlist scans 8 stored
      // doubles per row — the single-query configuration that pays
      val encDir = s"$Dir/rp_enc_${java.util.UUID.randomUUID().toString.take(8)}"
      val tE = System.nanoTime()
      Ann.rpEncode(emb, "embedding", projDim = 8)
        .write.mode("overwrite").parquet(encDir)
      println(f"[sf1] rp_encode_52k             ${(System.nanoTime() - tE) / 1e9}%7.2f s")
      val enc = spark.read.parquet(encDir).localCheckpoint(true)
      Ann.rpSearchEncoded(enc, qv, cfg, projDim = 8, refine = 4)
        .write.format("noop").mode("overwrite").save()
      timed("rp_knn_stored_52k")(
        Ann.rpSearchEncoded(enc, qv, cfg, projDim = 8, refine = 4))
      val queries = emb.filter($"vec_id" < 100)
        .select($"vec_id".as(Search.QueryIdCol), $"embedding")
      Ann.rpMultiSearch(emb, queries, cfg.copy(limit = 5), projDim = 8,
        refine = 4).write.format("noop").mode("overwrite").save()
      timed("rp_multi_exact_52k")(
        Search.multiSearch(emb, queries, cfg.copy(limit = 5)))
      timed("rp_multi_52k")(Ann.rpMultiSearch(emb, queries,
        cfg.copy(limit = 5), projDim = 8, refine = 4))

      def recallOf(corpus: DataFrame, qs: DataFrame, projDim: Int,
          refine: Int = 4): Double = {
        val exact = Search.multiSearch(corpus, qs, cfg.copy(limit = 5))
          .select(col(Search.QueryIdCol).as("q"), $"vec_id")
          .localCheckpoint(true)
        val approx = Ann.rpMultiSearch(corpus, qs, cfg.copy(limit = 5),
          projDim = projDim, refine = refine)
          .select(col(Search.QueryIdCol).as("q"), $"vec_id")
        approx.join(exact, Seq("q", "vec_id")).count().toDouble / exact.count()
      }
      // structure-free: measured ~0.21 FLAT across projDim 8→32 — the
      // corpus, not the dial, is the binding constraint (all distances
      // concentrate; the top-5 gaps sit below even a 32-dim projection's
      // distortion), the exact finding the LSH stage recorded at ~0.23.
      // Recorded, not asserted high: the honest statement is that NO
      // projection method beats a gapless corpus, and the clustered
      // regime below is where RP applies.
      val free = Seq(8, 16, 32).map(p => p -> recallOf(emb, queries, p))
      free.foreach { case (p, r) =>
        println(f"[sf1] rp_recall5_free_p$p%-8d $r%7.3f") }
      assert(free.forall(_._2 > 0.05),
        s"even the gapless corpus should beat the random-20-of-52.5k floor: $free")
      // clustered corpus, same size/dim: 256 tight clusters
      val clustered = spark.range(52500L).map { id =>
        val c = (id % 256L).toInt
        val cr = new java.util.Random(c * 31L + 7L)
        val center = Array.fill(64)(cr.nextGaussian() * 5)
        val rnd = new java.util.Random(id * 13L + 1L)
        (id, center.map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
      }.toDF("vec_id", "embedding").localCheckpoint(true)
      val cq = clustered.filter($"vec_id" < 100)
        .select($"vec_id".as(Search.QueryIdCol), $"embedding")
      // JL ROUTES reliably (cross-cluster gaps are ~50× the noise) but
      // within-cluster fine ranking is gapless noise again — so the
      // rerank must COVER the routed cluster: size refine to the
      // expected occupancy (~205 here), the IVF probe-sizing analog.
      // refine 4 (shortlist 20 ≪ occupancy) is recorded as the
      // under-sized negative control; refine 45 (shortlist 225 ≥
      // occupancy) must be essentially exact.
      val rcSmall = recallOf(clustered, cq, 8)
      val rcCover = recallOf(clustered, cq, 8, refine = 45)
      println(f"[sf1] rp_recall5_clu_p8_r4     $rcSmall%7.3f (under-sized control)")
      println(f"[sf1] rp_recall5_clu_p8_r45    $rcCover%7.3f")
      assert(rcCover >= 0.95,
        s"cluster-covering rerank recall $rcCover — JL must route to the right cluster")
    }
    }

    if (bpeStage) {
    // --- BPE tokenizer at rehearsal scale (r9 cont. 2): the word-freq
    // dictionary is the ONLY distributed training cost (shuffle =
    // distinct word types, capped); the merge loop is driver-local over
    // the capped dict, so its time must be corpus-size-INDEPENDENT; the
    // apply path is a map-side replace chain whose per-doc cost grows
    // with the merge-list length — timed at two chain lengths. ---
    {
      import graft.operators.Bpe
      val t0 = System.nanoTime()
      val wf = Bpe.wordFreq(docs, "text", maxWordTypes = 20000)
      println(f"[sf1] bpe_wordfreq_52k            ${(System.nanoTime() - t0) / 1e9}%7.2f s types=${wf.size}")
      val t1 = System.nanoTime()
      val m200 = Bpe.trainMerges(wf, numMerges = 200)
      println(f"[sf1] bpe_train200_driver         ${(System.nanoTime() - t1) / 1e9}%7.2f s merges=${m200.size}")
      val m64 = m200.take(64)
      // warmup the apply plan shape once (codegen for the replace chain)
      docs.limit(1000).select(Bpe.bpeTokenCount($"text", m64))
        .write.format("noop").mode("overwrite").save()
      timed("bpe_count64_52k")(
        docs.select($"doc_id", Bpe.bpeTokenCount($"text", m64).as("n")))
      timed("bpe_count200_52k")(
        docs.select($"doc_id", Bpe.bpeTokenCount($"text", m200).as("n")))

      // in-run invariant: engine counts == driver-side greedy segmenter
      // on sampled docs under the 200-merge list
      val sampleIds = Seq(3L, 1007L, 25013L, 49999L, 10000060L)
      val got = docs.filter($"doc_id".isin(sampleIds: _*))
        .select($"doc_id", Bpe.bpeTokenCount($"text", m200).as("n"), $"text")
        .as[(Long, Long, String)].collect()
      got.foreach { case (id, n, text) =>
        val ref = text.toLowerCase.split("\\s+").filter(_.nonEmpty).map { w =>
          m200.foldLeft(w.map(_.toString).toList) { case (s, (a, b)) =>
            val out = List.newBuilder[String]
            var rest = s
            while (rest.nonEmpty) rest match {
              case x :: y :: tail if x == a && y == b => out += a + b; rest = tail
              case x :: tail => out += x; rest = tail
              case Nil =>
            }
            out.result()
          }.size.toLong
        }.sum
        assert(n == ref, s"doc $id: engine $n vs replay $ref")
      }
      println(s"[sf1] bpe_count==replay          docs=${got.length}")

      // --- single-pass kernel at realistic merge counts (r10, VERDICT
      // r9 #2): the replace chain's per-row cost is O(merge list), the
      // kernel's is O(applied merges) — independent of list length. Legs:
      // chain vs kernel on the SAME 100-merge list (head-to-head), the
      // kernel at 2,000 REAL trained merges, and at a 10,200-entry list
      // (200 real + 10k pad over a disjoint alphabet — pads can never
      // apply, so output must equal the 200-merge chain bit-for-bit:
      // B-invariance at corpus scale). ---
      val m100 = m200.take(100)
      def countVia(seg: org.apache.spark.sql.Column) =
        docs.select($"doc_id", Bpe.tokenCountFromSegments(seg).as("n"))
      // head-to-head at the dispatch boundary (both paths warm)
      countVia(Bpe.segmentTokensKernel($"text", m100)).limit(1000)
        .write.format("noop").mode("overwrite").save()
      timed("bpe_chain100_52k")(countVia(Bpe.segmentTokensChain($"text", m100)))
      timed("bpe_kernel100_52k")(countVia(Bpe.segmentTokensKernel($"text", m100)))
      val tT = System.nanoTime()
      val m2000 = Bpe.trainMerges(wf, numMerges = 2000)
      println(f"[sf1] bpe_train2000_driver        ${(System.nanoTime() - tT) / 1e9}%7.2f s merges=${m2000.size}")
      timed("bpe_kernel2000_52k")(countVia(Bpe.segmentTokensKernel($"text", m2000)))
      val m10k = m200 ++ (0 until 10000).map(i => (s"X$i", s"Y$i"))
      timed("bpe_kernel10k_52k")(countVia(Bpe.segmentTokensKernel($"text", m10k)))

      // B-invariance: the 10,200-merge kernel (through the public
      // dispatch) equals the 200-merge chain on EVERY document
      val mism = docs.select($"doc_id",
          Bpe.tokenCountFromSegments(
            Bpe.segmentTokensChain($"text", m200)).as("a"),
          Bpe.tokenCountFromSegments(
            Bpe.segmentTokens($"text", m10k)).as("b"))
        .filter($"a" =!= $"b").count()
      assert(mism == 0L, s"$mism docs diverge between chain200 and kernel10k")
      println(s"[sf1] bpe_kernel10k==chain200    all ${docs.count()} docs")

      // kernel at 2,000 real merges == driver-side sequential replay
      val got2k = docs.filter($"doc_id".isin(sampleIds: _*))
        .select($"doc_id", Bpe.bpeTokenCount($"text", m2000).as("n"), $"text")
        .as[(Long, Long, String)].collect()
      got2k.foreach { case (id, n, text) =>
        val ref = text.toLowerCase.split("\\s+").filter(_.nonEmpty).map { w =>
          m2000.foldLeft(w.map(_.toString).toList) { case (s, (a, b)) =>
            val out = List.newBuilder[String]
            var rest = s
            while (rest.nonEmpty) rest match {
              case x :: y :: tail if x == a && y == b => out += a + b; rest = tail
              case x :: tail => out += x; rest = tail
              case Nil =>
            }
            out.result()
          }.size.toLong
        }.sum
        assert(n == ref, s"doc $id: kernel $n vs 2000-merge replay $ref")
      }
      println(s"[sf1] bpe_kernel2000==replay     docs=${got2k.length}")
    }
    }

    if (dsirStage) {
      import graft.operators.Dsir
      // --- DSIR importance resampling (r10): fit = one scan + a
      // bucket-bounded agg (8,192 rows to the driver, corpus-independent);
      // scoring = map-only codegen (the 64 KB ratio table rides the
      // expression — asserted: NO Exchange in the plan); the Gumbel draw
      // = threshold selection, so sample-size independence is inherited
      // from the Selection legs and re-asserted here against the rank
      // cut at two k's over a 525k-doc corpus. ---
      val tF = System.nanoTime()
      val raw = Dsir.fit(docs, "text")
      println(f"[sf1] dsir_fit_52k              ${(System.nanoTime() - tF) / 1e9}%7.2f s " +
        s"grams=${raw.total}")
      val tT = System.nanoTime()
      val target = Dsir.fit(docs.filter($"doc_id" % 10 === 0), "text")
      println(f"[sf1] dsir_fit_target           ${(System.nanoTime() - tT) / 1e9}%7.2f s " +
        s"grams=${target.total}")
      // both models in ONE scan — the production spelling (at 100 TB the
      // second pass is the dominant avoidable cost); asserted count-equal
      // to the two separate fits
      val tB = System.nanoTime()
      val (tgtB, rawB) = Dsir.fitBoth(docs, "text", $"doc_id" % 10 === 0)
      println(f"[sf1] dsir_fit_both             ${(System.nanoTime() - tB) / 1e9}%7.2f s " +
        s"grams=${rawB.total}")
      assert(tgtB.counts.sameElements(target.counts) && tgtB.total == target.total &&
        rawB.counts.sameElements(raw.counts) && rawB.total == raw.total,
        "fitBoth diverges from the two-pass fits")
      val ratios = Dsir.logRatios(target, raw)
      val sPlan = Dsir.scoreDocs(docs, "text", ratios)
        .queryExecution.executedPlan.toString
      assert(!sPlan.contains("Exchange"), "dsir scoring plan shuffles")
      println(s"[sf1] dsir_score plan           map-only (no Exchange)")
      timed("dsir_score_52k")(Dsir.scoreDocs(docs, "text", ratios))
      // 10× corpus — map-side scoring must scale ~linearly
      val docs525 = docs.crossJoin(spark.range(10).select($"id".as("rep")))
        .select(($"doc_id" * 10 + $"rep").as("doc_id"), $"text")
        .localCheckpoint(true)
      timed("dsir_score_525k")(Dsir.scoreDocs(docs525, "text", ratios))
      val scored525 = Dsir.scoreDocs(docs525, "text", ratios)
        .localCheckpoint(true)
      for (k <- Seq(52500L, 315000L)) {
        val tR = System.nanoTime()
        val sel = Dsir.resample(scored525, "doc_id", "logw", k)
        val n = sel.count()
        val sec = (System.nanoTime() - tR) / 1e9
        assert(n == k, s"resample kept $n, want $k")
        val ref = scored525
          .withColumn("__k", $"logw" + Dsir.gumbelNoise($"doc_id"))
          .orderBy(desc("__k"), asc("doc_id")).limit(k.toInt)
        val missing = ref.select("doc_id").exceptAll(sel.select("doc_id")).count()
        assert(missing == 0L, s"resample diverges from the rank cut by $missing at k=$k")
        println(f"[sf1] dsir_resample_${k}%-6d      $sec%7.2f s == rank cut")
      }

      // --- hashed-TF text similarity (r10 cont.): fresh probe
      // (tokenize + hash every row) vs the encode-once SPARSE counts
      // probe — the rpEncode/sq8-codes discipline for text; probes
      // asserted row-identical. ---
      import graft.operators.TextVector
      val qText = docs.filter($"doc_id" === 7L).head.getString(1)
      timed("textsim_fresh_52k")(
        TextVector.cosineTopK(docs, "doc_id", "text", qText, 8192, 10))
      val tE = System.nanoTime()
      val enc = TextVector.encode(docs, "doc_id", "text", 8192)
        .localCheckpoint(true)
      println(f"[sf1] textsim_encode_52k        ${(System.nanoTime() - tE) / 1e9}%7.2f s")
      timed("textsim_stored_52k")(
        TextVector.cosineTopKEncoded(enc, "doc_id", "tf_counts", qText, 8192, 10))
      val freshRows = TextVector.cosineTopK(docs, "doc_id", "text", qText, 8192, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val storedRows = TextVector.cosineTopKEncoded(enc, "doc_id", "tf_counts", qText, 8192, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(freshRows == storedRows, "stored probe diverges from fresh")
      println(s"[sf1] textsim_stored==fresh     top-10 identical")
    }

    if (chunkStage) {
      import graft.operators.Chunking
      // --- token-window chunking (r10): map-only by construction
      // (asserted), linear in corpus; the coverage invariant
      // total_tok == n + (chunks−1)·overlap holds for EVERY document. ---
      val cPlan = Chunking.chunkByTokens(docs, "text", 128, 32)
        .queryExecution.executedPlan.toString
      assert(!cPlan.contains("Exchange"), "chunk plan shuffles")
      println(s"[sf1] chunk plan                map-only (no Exchange)")
      timed("chunk_52k_w128")(Chunking.chunkByTokens(docs, "text", 128, 32))
      timed("chunk_52k_w32")(Chunking.chunkByTokens(docs, "text", 32, 8))
      val ch = Chunking.chunkByTokens(docs, "text", 32, 8)
      val nDocCol = size(filter(split($"text", graft.functions.TextHash.WsRegex),
        t => t =!= ""))
      val bad = Chunking.chunkManifest(ch, "doc_id")
        .join(docs.select($"doc_id", nDocCol.as("n")), "doc_id")
        .where($"total_tok" =!= $"n" + ($"chunks" - 1) * 8)
        .count()
      assert(bad == 0L, s"$bad docs violate the coverage invariant")
      println(s"[sf1] chunk_manifest            invariant holds over ${docs.count()} docs")
    }

    if (pcaStage) {
      import graft.operators.{Pca, Search => S, SearchConfig => SC}
      // --- PCA at 52.5k 64-dim embeddings (r10 cont.). The fit's only
      // distributed work is ONE moment scan — each row packs
      // 1+64+2080 = 2145 doubles and map-side combine folds every
      // partition to 2145 rows before the shuffle, so the driver fetch
      // and O(d³) eigensolve are corpus-size-independent. Transform and
      // whitening are map-only (asserted). The shortlist recall story
      // is the RP/LSH two-regime finding: the structure-free corpus
      // binds every projection method; on a clustered corpus of the
      // same size/dim the variance-optimal axes route near-perfectly
      // at k=8. ---
      val tM = System.nanoTime()
      val mom = Pca.moments(emb, "embedding")
      println(f"[sf1] pca_moments_52k           ${(System.nanoTime() - tM) / 1e9}%7.2f s (n=${mom.n.toLong})")
      val tF = System.nanoTime()
      val m = Pca.fitFromMoments(mom, k = 16)
      println(f"[sf1] pca_eigensolve_d64        ${(System.nanoTime() - tF) / 1e9}%7.2f s (driver)")
      val ePlan = Pca.pcaEncode(emb, "embedding", m)
        .queryExecution.executedPlan.toString
      assert(!ePlan.contains("Exchange"), "pca transform plan shuffles")
      println(s"[sf1] pca_encode plan           map-only (no Exchange)")
      timed("pca_encode_52k")(Pca.pcaEncode(emb, "embedding", m))
      timed("pca_whiten_52k")(Pca.pcaWhitenEncode(emb, "embedding", m))
      // update == refit: fold the odd half into the even half's moments,
      // compare against the one-shot full statistic
      val updated = Pca.pcaUpdate(
        Pca.moments(emb.filter($"vec_id" % 2 === 0), "embedding"),
        emb.filter($"vec_id" % 2 =!= 0), "embedding")
      val drift = updated.sums.zip(mom.sums).map { case (u, f) =>
        math.abs(u - f) / math.max(1d, math.abs(f)) }.max
      assert(drift <= 1e-9, s"update vs refit moment drift $drift")
      println(f"[sf1] pca_update==refit         max rel drift $drift%.1e over ${mom.sums.length} moments")
      // stored-projection search vs the exact scan
      val cfg = SC(
        scoreFuncName = "VectorDistance", higherIsBetter = false, limit = 10,
        featureCol = "embedding", keyCols = Seq("vec_id"),
        tieBreakCol = Some("vec_id"), assumeUniqueKeys = true)
      val enc = Pca.pcaEncode(emb, "embedding", m).localCheckpoint(true)
      val qv = emb.filter($"vec_id" === 1L).select("embedding")
        .head.getSeq[Float](0)
      Pca.pcaSearchEncoded(enc, qv, m, cfg, refine = 32)
        .write.format("noop").mode("overwrite").save() // warmup
      timed("pca_exact_52k")(S.search(emb, qv, cfg))
      timed("pca_knn_stored_52k")(
        Pca.pcaSearchEncoded(enc, qv, m, cfg, refine = 32))
      def recallOf(corpus: DataFrame, encoded: DataFrame, model: Pca.PcaModel,
          refine: Int): Double = {
        val qs = corpus.filter($"vec_id" < 20)
          .select("vec_id", "embedding")
          .collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
        val rs = qs.map { case (_, q) =>
          val exact = S.search(corpus, q, cfg)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          val approx = Pca.pcaSearchEncoded(encoded, q, model, cfg,
            refine = refine)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          (approx intersect exact).size.toDouble / exact.size
        }
        rs.sum / rs.length
      }
      val freeRecall = recallOf(emb, enc, m, refine = 32)
      println(f"[sf1] pca_recall10_free_k16     $freeRecall%7.3f (gapless corpus binds — the RP/LSH finding)")
      // clustered corpus, same size/dim: 256 tight clusters — the
      // regime PCA is FOR (variance concentrated in true directions)
      val clustered = spark.range(52500L).map { id =>
        val c = (id % 256L).toInt
        val cr = new java.util.Random(c * 31L + 7L)
        val center = Array.fill(64)(cr.nextGaussian() * 5)
        val rnd = new java.util.Random(id * 13L + 1L)
        (id, center.map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
      }.toDF("vec_id", "embedding").localCheckpoint(true)
      // PCA ROUTES to the right cluster (between-cluster variance is
      // what the axes maximize) but within-cluster fine ranking is
      // gapless noise — the rerank must COVER the routed cluster's
      // occupancy (~205 here), the same IVF probe-sizing analog the rp
      // stage recorded. refine 4 (shortlist 40 ≪ occupancy) is the
      // under-sized negative control; refine 22 (shortlist 220 ≥
      // occupancy) must be essentially exact.
      val mc = Pca.fit(clustered, "embedding", k = 8)
      val encC = Pca.pcaEncode(clustered, "embedding", mc).localCheckpoint(true)
      val rcSmall = recallOf(clustered, encC, mc, refine = 4)
      val rcCover = recallOf(clustered, encC, mc, refine = 22)
      println(f"[sf1] pca_recall10_clu_k8_r4    $rcSmall%7.3f (under-sized control)")
      println(f"[sf1] pca_recall10_clu_k8_r22   $rcCover%7.3f")
      assert(rcCover >= 0.95,
        s"cluster-covering rerank recall $rcCover — PCA must route to the right cluster")
    }

    if (layoutStage) {
      import graft.sources.Layout
      // --- layout optimization at 525k docs (r10 cont.): the same
      // corpus written FLAT vs partitioned-by-lang + range-sorted by a
      // numeric score; a selective (lang, score-band) aggregate is then
      // timed over both. The pruned layout must (a) return the
      // IDENTICAL aggregate, (b) carry the filter into the scan
      // (PartitionFilters + PushedFilters, asserted), and (c) be
      // measurably cheaper — directory pruning alone removes ~80% of
      // the bytes here (1 of 5 langs); at 100 TB with date+lang
      // partitioning it removes ~everything a filter names. ---
      val docs525 = spark.range(525000L).map { id =>
        val rnd = new java.util.Random(id * 6364136223846793005L + 11L)
        val langs = Seq("en", "de", "fr", "es", "zh")
        (id, langs(rnd.nextInt(5)), rnd.nextInt(1000),
          s"body ${id} ${"x" * rnd.nextInt(200)}")
      }.toDF("doc_id", "lang", "score", "text")
      val flatDir = s"$Dir/layout_flat"
      val optDir = s"$Dir/layout_opt"
      if (!new java.io.File(s"$flatDir/_SUCCESS").exists()) {
        val t0 = System.nanoTime()
        docs525.write.mode("overwrite").parquet(flatDir)
        println(f"[sf1] layout_write_flat_525k    ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        val t1 = System.nanoTime()
        Layout.optimize(docs525, optDir, Seq("lang"), Seq("score"))
        println(f"[sf1] layout_write_opt_525k     ${(System.nanoTime() - t1) / 1e9}%7.2f s")
      }
      def probe(dir: String): (Double, Long) = {
        val scan = spark.read.parquet(dir)
          .filter($"lang" === "en" && $"score".between(100, 199))
        val t0 = System.nanoTime()
        val n = scan.agg(count(lit(1)), sum($"score"))
          .head.getLong(0)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      probe(flatDir); probe(optDir) // warm file listings
      val (tFlat, nFlat) = probe(flatDir)
      val (tOpt, nOpt) = probe(optDir)
      assert(nFlat == nOpt, s"layout rewrite changed results: $nFlat vs $nOpt")
      val scanOpt = spark.read.parquet(optDir)
        .filter($"lang" === "en" && $"score".between(100, 199))
      val (pp, pf) = Layout.pruning(scanOpt)
      assert(pp, "partition filter did not reach the optimized scan")
      assert(pf, "range filter was not pushed to the optimized scan")
      val (ppFlat, _) = Layout.pruning(
        spark.read.parquet(flatDir).filter($"lang" === "en"))
      assert(!ppFlat, "flat layout cannot partition-prune")
      println(f"[sf1] layout_scan_flat_525k     $tFlat%7.2f s ($nFlat rows)")
      println(f"[sf1] layout_scan_opt_525k      $tOpt%7.2f s ($nOpt rows, PartitionFilters+PushedFilters)")

      // bucketed join vs shuffle join at 525k×52.5k, broadcast disabled
      // both times — the write-once shuffle amortization measured
      val dim = spark.range(52500L)
        .select($"id".as("k"), ($"id" % 97).as("attr"))
      val fact = docs525.select(($"doc_id" % 52500L).as("k"), $"score")
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val tS = System.nanoTime()
        fact.join(dim, "k").groupBy("attr").agg(sum($"score"))
          .write.format("noop").mode("overwrite").save()
        println(f"[sf1] layout_join_shuffle_525k  ${(System.nanoTime() - tS) / 1e9}%7.2f s")
        Layout.bucketize(fact, "graft_sf1_fact", s"$Dir/bkt_fact", Seq("k"), 16)
        Layout.bucketize(dim, "graft_sf1_dim", s"$Dir/bkt_dim", Seq("k"), 16)
        val j = spark.table("graft_sf1_fact").join(spark.table("graft_sf1_dim"), "k")
          .groupBy("attr").agg(sum($"score"))
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        assert(!plan.contains("hashpartitioning(k"),
          s"bucketed join shuffled the join key:\n$plan")
        val tB = System.nanoTime()
        j.write.format("noop").mode("overwrite").save()
        println(f"[sf1] layout_join_bucketed_525k ${(System.nanoTime() - tB) / 1e9}%7.2f s (no join-key Exchange)")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        spark.sql("DROP TABLE IF EXISTS graft_sf1_fact")
        spark.sql("DROP TABLE IF EXISTS graft_sf1_dim")
      }

      // small-file compaction at 525k rows / 256 tiny files
      val cmpDir = s"$Dir/layout_cmp"
      docs525.repartition(256).write.mode("overwrite").parquet(cmpDir)
      val nBefore = new java.io.File(cmpDir).listFiles()
        .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      val tC = System.nanoTime()
      val nAfter = Layout.compact(spark, cmpDir)
      println(f"[sf1] layout_compact_525k       ${(System.nanoTime() - tC) / 1e9}%7.2f s ($nBefore -> $nAfter files)")
      assert(nAfter < nBefore)
      assert(spark.read.parquet(cmpDir).count() == 525000L)
    }

    if (zorderStage) {
      import graft.sources.Layout
      // --- z-order at 525k rows (r10 cont.): two independent uniform
      // dims; three layouts of the SAME data — flat, single-sorted on x,
      // z-ordered on (x, y) — then a 5%-selective band scan on EACH dim
      // timed over all three. The single sort wins its own dim and does
      // nothing for the other; z-order must bound the per-file extents
      // of BOTH dims (asserted) and beat flat on both band scans. ---
      val pts = spark.range(525000L).select(
        $"id",
        pmod($"id" * 7919L, lit(525000L)).cast("double").as("x"),
        pmod($"id" * 104729L, lit(525000L)).cast("double").as("y"))
        .localCheckpoint()
      val zFlat = s"$Dir/z_flat"; val zSortX = s"$Dir/z_sortx"
      val zZ = s"$Dir/z_z"
      if (!new java.io.File(s"$zZ/_SUCCESS").exists()) {
        var t0 = System.nanoTime()
        pts.write.mode("overwrite").parquet(zFlat)
        println(f"[sf1] zorder_write_flat_525k   ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        t0 = System.nanoTime()
        Layout.optimize(pts, zSortX, Nil, Seq("x"), numRangeSplits = 32)
        println(f"[sf1] zorder_write_sortx_525k  ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        t0 = System.nanoTime()
        Layout.zorder(pts, zZ, Seq("x", "y"), bits = 8, numRangeSplits = 32)
        println(f"[sf1] zorder_write_z_525k      ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
      def band(dir: String, c: String): (Double, Long) = {
        val scan = spark.read.parquet(dir)
          .filter(col(c).between(200000.0, 226250.0)) // 5% band
        val t0 = System.nanoTime()
        val n = scan.agg(count(lit(1)), sum($"id")).head.getLong(0)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      for (dir <- Seq(zFlat, zSortX, zZ); c <- Seq("x", "y")) band(dir, c)
      for (c <- Seq("x", "y")) {
        val (tf, nf) = band(zFlat, c)
        val (ts, ns) = band(zSortX, c)
        val (tz, nz) = band(zZ, c)
        assert(nf == ns && ns == nz, s"layouts disagree on $c: $nf $ns $nz")
        println(f"[sf1] zorder_band_$c%s_525k      flat $tf%5.2f s | sortx $ts%5.2f s | z $tz%5.2f s ($nz rows)")
      }
      def meanExtent(dir: String, c: String): Double = {
        val r = Layout.fileExtents(spark, dir, c)
          .agg(avg($"hi" - $"lo"), max($"hi") - min($"lo")).head()
        r.getDouble(0) / math.max(r.getDouble(1), 1.0)
      }
      val (zx, zy) = (meanExtent(zZ, "x"), meanExtent(zZ, "y"))
      val sy = meanExtent(zSortX, "y")
      println(f"[sf1] zorder_extents_525k      z x=$zx%5.3f y=$zy%5.3f | sortx y=$sy%5.3f")
      assert(zx < 0.45 && zy < 0.45,
        s"z-order failed to bound both dims: x=$zx y=$zy")
      assert(sy > 0.8, s"sortx control unexpectedly bounded y: $sy")
      // the 100-TB metric: how many FILES the footer stats ADMIT for the
      // 5% y-band — the in-memory wall-clock above can't show it at this
      // size, the admitted-byte ratio is what scales
      def admitted(dir: String): (Long, Long) = {
        val ext = Layout.fileExtents(spark, dir, "y")
        (ext.filter($"hi" >= 200000.0 && $"lo" <= 226250.0).count(),
          ext.count())
      }
      val (aS, tS2) = admitted(zSortX)
      val (aZ, tZ2) = admitted(zZ)
      println(s"[sf1] zorder_admitted_y_525k   sortx $aS/$tS2 files | z $aZ/$tZ2 files")
      assert(aS == tS2, "sortx control should admit every file on y")
      assert(aZ.toDouble / tZ2 < 0.7,
        s"z-order admitted $aZ/$tZ2 files for a 5% band")
    }
    if (attrsStage) {
      import graft.operators.{Attributes, SnapshotDiff}
      import graft.functions.TextAnalysis
      // --- attribute store + snapshot diff at 525k docs (r10 cont.):
      // (a) tag+save the corpus once, (b) EXTEND with a second tagger —
      // must cost sidecar-join time, not another corpus-tag time,
      // (c) join-on-read filter, (d) diff against a v2 with planted
      // added/removed/changed (counts asserted exactly), (e) the
      // incremental retag (delta-sized) vs the full retag it must equal
      // row-for-row. ---
      def synthDoc(id: Long): (Long, String, String) = {
        val rnd = new java.util.Random(id * 2862933555777941757L + 3L)
        val langs = Seq("en", "de", "fr", "es", "zh")
        (id, langs(rnd.nextInt(5)),
          s"doc $id body w${rnd.nextInt(5000)} the of ${"x" * rnd.nextInt(80)}")
      }
      val corp = spark.range(525000L).map(id => synthDoc(id))
        .toDF("doc_id", "lang", "text").localCheckpoint(true)
      val baseTaggers = Seq(
        "n_tokens" -> TextAnalysis.tokenCount($"text").cast("long"),
        "quality" -> round(TextAnalysis.qualityScore($"text"), 6),
        "fp" -> TextAnalysis.fingerprint($"text"))
      val allTaggers = baseTaggers :+
        ("n_chars" -> length($"text").cast("long"))
      def tagAll(df: DataFrame) = Attributes.tag(df, "doc_id", baseTaggers)
      val store = s"$Dir/attr_store"
      var t0 = System.nanoTime()
      Attributes.attrSave(spark, store, tagAll(corp), "doc_id")
      println(f"[sf1] attr_tag_save_525k        ${(System.nanoTime() - t0) / 1e9}%7.2f s (3 taggers, one scan)")
      t0 = System.nanoTime()
      Attributes.attrExtend(spark, store, Attributes.tag(corp, "doc_id",
        Seq("n_chars" -> length($"text").cast("long"))))
      println(f"[sf1] attr_extend_525k          ${(System.nanoTime() - t0) / 1e9}%7.2f s (sidecar column join)")
      val (attrs, aid) = Attributes.attrLoad(spark, store)
      timed("attr_filter_525k")(
        Attributes.filterByAttrs(corp, attrs, aid,
          $"quality" >= 0.4 && $"n_tokens" >= 5))
      // v2: 2% removed, 1% changed, 2% added past the id range
      val added = spark.range(525000L, 535500L).map(id => synthDoc(id))
        .toDF("doc_id", "lang", "text")
      val v2 = corp.filter($"doc_id" % 50 =!= 0)
        .withColumn("text", when($"doc_id" % 100 === 7,
          concat($"text", lit(" v2"))).otherwise($"text"))
        .unionByName(added).localCheckpoint(true)
      t0 = System.nanoTime()
      val cen = SnapshotDiff.census(corp, v2, "doc_id",
          TextAnalysis.fingerprint($"text"))
        .as[(String, Long)].collect().toMap
      println(f"[sf1] diff_census_525k          ${(System.nanoTime() - t0) / 1e9}%7.2f s ($cen)")
      assert(cen("removed") == 10500L && cen("added") == 10500L &&
        cen("changed") == 5250L && cen("unchanged") == 509250L, cen.toString)
      // incremental retag (delta-sized) vs the full retag it must equal
      t0 = System.nanoTime()
      val d = SnapshotDiff.diff(corp, v2, "doc_id",
        TextAnalysis.fingerprint($"text")).localCheckpoint(true)
      val delta = d.filter($"status".isin(SnapshotDiff.Added, SnapshotDiff.Changed))
        .select("doc_id")
      Attributes.attrUpsert(spark, store,
        Attributes.tag(v2.join(delta, "doc_id"), "doc_id", allTaggers))
      Attributes.attrRemove(spark, store,
        d.filter($"status" === SnapshotDiff.Removed).select("doc_id"))
      val tIncr = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val full = tagAll(v2).localCheckpoint(true)
      val tFull = (System.nanoTime() - t0) / 1e9
      println(f"[sf1] attr_retag_incr_525k      $tIncr%7.2f s (15,750-doc delta) vs full retag $tFull%7.2f s")
      val gotStore = Attributes.attrLoad(spark, store)._1
        .select("doc_id", "n_tokens", "quality", "fp")
      assert(gotStore.count() == 525000L, "store row count after retag")
      assert(gotStore.exceptAll(full).count() == 0L &&
        full.exceptAll(gotStore).count() == 0L,
        "incremental store != full retag of v2")
      println(s"[sf1] attr_retag_equal_525k     store == full retag, row-for-row (525,000 rows)")

      // --- streaming maintenance: 3 × 175k-doc batches through
      // StreamingAttributes (tag + UPSERT at each boundary). The honest
      // cost claim measured: per-batch time grows with the SIDECAR
      // REWRITE (state 175k → 350k → 525k), while the tagging term stays
      // batch-sized; final store == one-shot tag of everything. ---
      {
        implicit val sqlCtx = spark.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val sDir = s"$Dir/attr_stream_store_${System.nanoTime()}"
        val ck = java.nio.file.Files
          .createTempDirectory("graft_sattr_ck").toString
        val stream = MemoryStream[(Long, String, String)]
        var times = Vector.empty[Double]
        def runOnce(): Unit = {
          val tb = System.nanoTime()
          val q = graft.streaming.StreamingAttributes.writer(
              stream.toDF.toDF("doc_id", "lang", "text"), sDir, "doc_id",
              baseTaggers)
            .option("checkpointLocation", ck).start()
          q.awaitTermination(300000)
          times :+= (System.nanoTime() - tb) / 1e9
        }
        (0 until 3).foreach { b =>
          stream.addData((b * 175000L until (b + 1) * 175000L)
            .map(synthDoc): _*)
          runOnce()
        }
        println(f"[sf1] attr_stream_batches_525k  ${times.map(t => f"$t%.2f").mkString(" / ")} s (state 175k -> 350k -> 525k)")
        val streamed = Attributes.attrLoad(spark, sDir)._1
        assert(streamed.count() == 525000L)
        val oneShot = tagAll(corp)
        assert(streamed.exceptAll(oneShot).count() == 0L &&
          oneShot.exceptAll(streamed).count() == 0L,
          "streamed store != one-shot tag")
        println(s"[sf1] attr_stream_equal_525k    streamed store == one-shot tag (525,000 rows)")
      }

      // --- diff-driven lexical index sync at 525k docs: v2 = corp with
      // 2% removed / 1% changed / 2% added (the diff fixture above);
      // sync (remove removed∪changed, append added∪changed) vs the
      // fresh v2 rebuild it must equal — postings row-identical, stats
      // exact. The structural claim measured: sync TOKENIZES only the
      // 15,750-doc delta; fresh tokenizes all 529,250. ---
      {
        import graft.operators.TextRetrieval
        val idxDir = s"$Dir/lex_sync_${System.nanoTime()}"
        var t1 = System.nanoTime()
        TextRetrieval.indexSave(idxDir,
          TextRetrieval.indexBuild(corp, "doc_id", "text"),
          TextRetrieval.corpusStats(corp, "text"))
        println(f"[sf1] lex_build_v1_525k         ${(System.nanoTime() - t1) / 1e9}%7.2f s")
        t1 = System.nanoTime()
        val d2 = SnapshotDiff.diff(corp, v2, "doc_id",
          TextAnalysis.fingerprint($"text")).localCheckpoint(true)
        TextRetrieval.indexRemove(spark, idxDir,
          d2.filter($"status".isin(SnapshotDiff.Removed, SnapshotDiff.Changed))
            .select("doc_id"), "doc_id")
        TextRetrieval.indexAppend(spark, idxDir,
          v2.join(d2.filter($"status".isin(SnapshotDiff.Added, SnapshotDiff.Changed))
            .select("doc_id"), "doc_id"), "doc_id", "text")
        val tSync = (System.nanoTime() - t1) / 1e9
        t1 = System.nanoTime()
        val freshDir = s"$Dir/lex_fresh_${System.nanoTime()}"
        TextRetrieval.indexSave(freshDir,
          TextRetrieval.indexBuild(v2, "doc_id", "text"),
          TextRetrieval.corpusStats(v2, "text"))
        val tFresh = (System.nanoTime() - t1) / 1e9
        println(f"[sf1] lex_sync_525k             $tSync%7.2f s (diff + 15,750-doc delta) vs fresh v2 rebuild $tFresh%7.2f s")
        val synced = TextRetrieval.indexLoad(spark, idxDir)
        val fresh = TextRetrieval.indexLoad(spark, freshDir)
        assert(synced.stats == fresh.stats,
          s"stats diverged: ${synced.stats} vs ${fresh.stats}")
        val sp = synced.postings.select("term", "doc_id", "__tf", "__dl")
        val fp2 = fresh.postings.select("term", "doc_id", "__tf", "__dl")
        assert(sp.exceptAll(fp2).count() == 0L && fp2.exceptAll(sp).count() == 0L,
          "synced postings != fresh rebuild")
        println(s"[sf1] lex_sync_equal_525k       synced index == fresh v2 build (postings row-identical, stats exact)")
      }
    }

    if (paragraphsStage) {
      import graft.operators.Dedup
      // --- paragraph dedup at 525k docs / 1.575M paragraphs (r10 cont.):
      // 1000 hot footer templates (525 copies each) AND one VIRAL
      // paragraph in 10% of docs (52,500 copies — the skew that breaks a
      // window-over-hash plan: one partition would sort 52,500 rows; the
      // min(struct) aggregate combines them map-side). Keep-first
      // ownership asserted exactly. ---
      val pcorp = spark.range(525000L).select($"id".as("doc_id"),
        concat_ws("\n",
          concat(lit("unique head of document "), $"id"),
          concat(lit("shared rights footer template "),
            ($"id" % 1000).cast("string"), lit(" all rights reserved")),
          when($"id" % 10 === 0,
            lit("viral boilerplate paragraph appearing in ten percent of docs"))
            .otherwise(concat(lit("unique tail of document "), $"id")))
          .as("text"))
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      val cleaned = Dedup.dedupParagraphs(pcorp, "doc_id", "text",
          "\n", minChars = 5)
        .localCheckpoint(true)
      val sec = (System.nanoTime() - t0) / 1e9
      val n = cleaned.count()
      val viral = cleaned.filter($"text".contains("viral boilerplate")).count()
      val footer = cleaned.filter($"text".contains("rights footer")).count()
      println(f"[sf1] dedup_paragraphs_525k     $sec%7.2f s ($n rows; viral 52,500->$viral, footers 525,000->$footer)")
      assert(n == 525000L, s"row count $n")
      assert(viral == 1L, s"viral paragraph kept $viral times, want 1")
      assert(footer == 1000L, s"footer survivors $footer, want 1000 (one per template)")
      // the owners (docs 0..999 own their own template; doc 0 owns viral)
      // keep their text byte-identical
      val doc7 = cleaned.filter($"doc_id" === 7L).select("text").head.getString(0)
      assert(doc7 ==
        "unique head of document 7\n" +
        "shared rights footer template 7 all rights reserved\n" +
        "unique tail of document 7", doc7)

      // --- 400-entry bad-phrase gate over the same 525k docs: the claim
      // "a production-sized list is N contains-probes over ONE rebuilt
      // token string per row" given a number. 10 phrases planted hot
      // (every 'template K rights' bigram for K<10), 390 never match. ---
      val phrases = (0 until 10).map(k => s"template $k all") ++
        (0 until 390).map(k => s"never matching phrase $k")
      val tBw = System.nanoTime()
      val hits = pcorp.filter(
          graft.functions.TextAnalysis.containsAnyPhrase($"text", phrases))
        .count()
      val bwSec = (System.nanoTime() - tBw) / 1e9
      println(f"[sf1] badwords_400_525k         $bwSec%7.2f s ($hits hits)")
      assert(hits == 5250L, s"expected 5,250 hits (10 hot templates x 525), got $hits")

      // --- training-shard export at 525k rows / 64 shards: rank + range
      // exchange + partitioned write, then the manifest re-read. ---
      val eDir = s"$Dir/export_525k_${System.nanoTime()}"
      val tEx = System.nanoTime()
      val man = graft.sources.TrainingExport
        .exportShards(pcorp, "doc_id", eDir, nShards = 64)
        .collect()
      val exSec = (System.nanoTime() - tEx) / 1e9
      println(f"[sf1] export_shards_525k        $exSec%7.2f s (64 shards, sizes ${man.map(_.getLong(1)).min}-${man.map(_.getLong(1)).max})")
      assert(man.length == 64 && man.map(_.getLong(1)).sum == 525000L)
      assert(man.map(_.getLong(1)).max - man.map(_.getLong(1)).min <= 1L)
    }
    spark.stop()
  }
}
