package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.{Clustering, Dedup, LanguageModel}

/** End-to-end streaming curation ([[CurationPipeline]]): micro-batches
  * flow clean → Gopher → LM-perplexity → lexical near-dup gate →
  * semantic near-dup gate, with survivors extending every state the next
  * batch gates against. Each planted row targets exactly one gate, so
  * the admitted sets pin the full chain and its order. */
class CurationPipelineSpec extends SparkTestBase {

  import spark.implicits._

  private def vec(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)

  private val seed = Seq(
    (1L, "the quick table is fast and clean today", vec(1, 0), 0),
    (2L, "a slow value of the batch line in order", vec(0, 1), 1),
    (3L, "the merge sort is small and neat here", vec(0.9, 0.1), 0))

  private val goodText10 = "the table is small and fast in line"
  private val htmlText11 =
    "<p>a neat order of the value goes here now</p><script>if (x<y) bad()</script>"
  private val cleanText11 = "a neat order of the value goes here now"
  private val gibberish12 = "zxq wvu jjj kkk lll mmm nnn ooo ppp qqq"

  test("a gate without its state artifact refuses loudly, naming the loader") {
    val batch = Seq((1L, "the table is here", vec(1, 0)))
      .toDF("doc_id", "text", "embedding")
    def msgOf(cfg: CurationPipeline.CurationConfig): String =
      intercept[IllegalArgumentException](
        CurationPipeline.curateBatch(batch, cfg,
          CurationPipeline.CurationState()).admitted.count()).getMessage
    assert(msgOf(CurationPipeline.CurationConfig(minAvgLogprob = Some(0)))
      .contains("lmLoad"))
    assert(msgOf(CurationPipeline.CurationConfig(minAvgLogodds = Some(0)))
      .contains("nbLoad"))
    assert(msgOf(CurationPipeline.CurationConfig(
      lexical = Some(StreamingDedup.DedupGateConfig("doc_id", "text"))))
      .contains("corpus/keys"))
    assert(msgOf(CurationPipeline.CurationConfig(
      semanticThreshold = Some(0.9))).contains("cluster state"))
    assert(msgOf(CurationPipeline.CurationConfig(minDsirLogw = Some(0)))
      .contains("Dsir.load"))
    assert(msgOf(CurationPipeline.CurationConfig(
      allowLangs = Some(Set("en")))).contains("lidLoad"))
  }

  test("language gate (trained LID) drops non-allowed docs, audit-labeled") {
    import graft.operators.{LangId, LangIdFixture}
    val lid = LangId.train(
      LangIdFixture.Train.toDF("lang", "text"), "lang", "text", 5, 20000)
    val batch = Seq(
      (1L, "where is the nearest train station please", vec(1, 0)),
      (2L, "wo ist der nächste bahnhof bitte schön", vec(0, 1)),
      (3L, "最近的火车站在哪里请告诉我", vec(1, 1)))
      .toDF("doc_id", "text", "embedding")
    val cfg = CurationPipeline.CurationConfig(clean = false,
      allowLangs = Some(Set("en", "zh")))
    val r = CurationPipeline.curateBatchAudited(batch, cfg,
      CurationPipeline.CurationState(lid = Some(lid)))
    assert(r.admitted.select("doc_id").as[Long].collect().toSet === Set(1L, 3L))
    val ledger = r.rejects.get
      .select("doc_id", "stage", "reason").as[(Long, String, String)].collect()
    assert(ledger.map(_._1).toSeq === Seq(2L))
    assert(ledger.head._2 === CurationPipeline.StageLang)
    assert(ledger.head._3 === "lang_pred not in {en,zh}")
    // empty allow-set refuses loudly
    val e = intercept[IllegalArgumentException](
      CurationPipeline.curateBatch(batch,
        CurationPipeline.CurationConfig(allowLangs = Some(Set.empty)),
        CurationPipeline.CurationState(lid = Some(lid))))
    assert(e.getMessage.contains("empty language set"))
  }

  test("per-language LM routing: each doc scored under ITS language's model") {
    import graft.operators.{LangId, LangIdFixture}
    val lid = LangId.train(
      LangIdFixture.Train.toDF("lang", "text"), "lang", "text", 5, 20000)
    val enPass = "where is the nearest train station please"
    val dePass = "wo ist der nächste bahnhof bitte schön"
    val enFail = "the qqz wwz vvz kkz mmz nnz ppz rrz and"
    val deFail = "wo der öqz üqz äqz zqz fqz gqz hqz ist"
    // pin the routing key: LID must call these en/en/de/de (loud if the
    // fixture model ever drifts — the test premise, not the test)
    val m = graft.functions.LidKernel.model(lid)
    val preds = Seq(enPass, enFail, dePass, deFail).toDF("text")
      .select(graft.functions.LidScoreExpr(col("text"), m)
        .getField("lang_pred").as("p")).as[String].collect().toSeq
    assert(preds == Seq("en", "en", "de", "de"), s"LID premise broke: $preds")
    val lmEn = LanguageModel.trainBigram(
      Seq.tabulate(5)(i => (i.toLong, enPass)).toDF("doc_id", "text"),
      "text", vocabCap = 1000)
    val lmDe = LanguageModel.trainBigram(
      Seq.tabulate(5)(i => (i.toLong, dePass)).toDF("doc_id", "text"),
      "text", vocabCap = 1000)
    def score(txt: String, lm: LanguageModel.BigramLM): Double =
      LanguageModel.scoreDocs(Seq((0L, txt)).toDF("doc_id", "text"),
        "doc_id", "text", lm).select("avg_logprob").as[Double].head()
    // runtime threshold, midway between the worst passer and the best
    // failer UNDER THE ROUTED MODELS — fixture-robust, no magic literal
    val passLo = math.min(score(enPass, lmEn), score(dePass, lmDe))
    val failHi = math.max(score(enFail, lmEn), score(deFail, lmDe))
    assert(failHi < passLo, s"no separation: failHi=$failHi passLo=$passLo")
    val thr = (passLo + failHi) / 2
    val batch = Seq(
      (1L, enPass, vec(1, 0)), (2L, dePass, vec(0, 1)),
      (3L, enFail, vec(1, 1)), (4L, deFail, vec(0, 0)))
      .toDF("doc_id", "text", "embedding")
    val cfg = CurationPipeline.CurationConfig(clean = false,
      allowLangs = Some(Set("en", "de")), minAvgLogprob = Some(thr))
    val st = CurationPipeline.CurationState(lid = Some(lid),
      lmByLang = Map("en" -> lmEn, "de" -> lmDe))
    val r = CurationPipeline.curateBatchAudited(batch, cfg, st)
    assert(r.admitted.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    assert(!r.admitted.columns.contains("__lang")) // routing col scrubbed
    val led = r.rejects.get.select("doc_id", "stage", "reason")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(led.map(_._1).toSeq == Seq(3L, 4L))
    assert(led.forall(_._2 == CurationPipeline.StageLm))
    assert(led(0)._3.endsWith("(lm[en])"), led(0)._3)
    assert(led(1)._3.endsWith("(lm[de])"), led(1)._3)
    // the de doc FAILS under the en model: routing is what admitted it
    assert(score(dePass, lmEn) < thr)
    // missing-language model refuses loudly, naming the language
    val miss = intercept[IllegalArgumentException](
      CurationPipeline.curateBatch(batch, cfg,
        st.copy(lmByLang = Map("en" -> lmEn))))
    assert(miss.getMessage.contains("no model for de"))
    // per-language models without the language gate refuse loudly
    val nogate = intercept[IllegalArgumentException](
      CurationPipeline.curateBatch(batch,
        CurationPipeline.CurationConfig(clean = false,
          minAvgLogprob = Some(thr)), st))
    assert(nogate.getMessage.contains("allowLangs"))
    // single LM + per-language map together is ambiguous: refused
    val amb = intercept[IllegalArgumentException](
      CurationPipeline.curateBatch(batch, cfg, st.copy(lm = Some(lmEn))))
    assert(amb.getMessage.contains("ambiguous"))
  }

  test("per-language NB routing: quality gate under the language's classifier") {
    import graft.operators.{LangId, LangIdFixture, QualityClassifier}
    val lid = LangId.train(
      LangIdFixture.Train.toDF("lang", "text"), "lang", "text", 5, 20000)
    val enGood = "where is the nearest train station please"
    val deGood = "wo ist der nächste bahnhof bitte schön"
    val enSpam = "the casino casino casino and casino bonus"
    val deSpam = "der kasino kasino kasino und kasino bonus"
    val m = graft.functions.LidKernel.model(lid)
    val preds = Seq(enGood, enSpam, deGood, deSpam).toDF("text")
      .select(graft.functions.LidScoreExpr(col("text"), m)
        .getField("lang_pred").as("p")).as[String].collect().toSeq
    assert(preds == Seq("en", "en", "de", "de"), s"LID premise broke: $preds")
    def nb(good: String, spam: String) = QualityClassifier.trainNb(
      Seq.tabulate(5)(i => (i.toLong, good)).toDF("doc_id", "text"),
      Seq.tabulate(5)(i => (i.toLong, spam)).toDF("doc_id", "text"),
      "text", vocabCap = 100)
    val st = CurationPipeline.CurationState(lid = Some(lid),
      nbByLang = Map("en" -> nb(enGood, enSpam), "de" -> nb(deGood, deSpam)))
    val batch = Seq(
      (1L, enGood, vec(1, 0)), (2L, deGood, vec(0, 1)),
      (3L, enSpam, vec(1, 1)), (4L, deSpam, vec(0, 0)))
      .toDF("doc_id", "text", "embedding")
    val cfg = CurationPipeline.CurationConfig(clean = false,
      allowLangs = Some(Set("en", "de")), minAvgLogodds = Some(0.0))
    val r = CurationPipeline.curateBatchAudited(batch, cfg, st)
    assert(r.admitted.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    val led = r.rejects.get.select("doc_id", "stage", "reason")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(led.map(_._1).toSeq == Seq(3L, 4L))
    assert(led.forall(_._2 == CurationPipeline.StageNb))
    assert(led(0)._3.endsWith("(nb[en])"), led(0)._3)
    assert(led(1)._3.endsWith("(nb[de])"), led(1)._3)
    val miss = intercept[IllegalArgumentException](
      CurationPipeline.curateBatch(batch, cfg,
        st.copy(nbByLang = st.nbByLang - "de")))
    assert(miss.getMessage.contains("no model for de"))
  }

  test("DSIR target-distribution gate drops off-target docs in the chain") {
    import graft.operators.Dsir
    // target = seed-like text; raw = target ∪ off-target spam. At toy
    // corpus sizes the add-α mass dominates (α·B ≫ N), so absolute
    // weights sit near zero — the gate threshold is set from the MEASURED
    // separation (scores must differ by ≥ 2 nats), exactly how a
    // production floor is calibrated against a held-out margin
    val tgtDf = seed.map { case (id, t, _, _) => (id, t) }.toDF("doc_id", "text")
    val offDf = Seq((600L, "zzz yyy xxx www zzz yyy xxx www"),
      (601L, "qqq ppp ooo nnn qqq ppp")).toDF("doc_id", "text")
    val target = Dsir.fit(tgtDf, "text", 256)
    val raw = Dsir.merge(target, Dsir.fit(offDf, "text", 256))
    val ratios = Dsir.logRatios(target, raw)
    val batch = Seq(
      (40L, "the quick table is fast and clean today", vec(1, 1)),
      (41L, "zzz yyy xxx www zzz yyy", vec(1, 2)))
      .toDF("doc_id", "text", "embedding")
    val scores = Dsir.scoreDocs(batch.select($"doc_id", $"text"), "text", ratios)
      .select("doc_id", "logw").as[(Long, Double)].collect().toMap
    assert(scores(40L) - scores(41L) > 2.0,
      s"target/off-target separation collapsed: $scores")
    val cfg = CurationPipeline.CurationConfig(
      minDsirLogw = Some((scores(40L) + scores(41L)) / 2))
    val r = CurationPipeline.curateBatch(batch, cfg,
      CurationPipeline.CurationState(dsir = Some(ratios)))
    assert(r.admitted.select("doc_id").as[Long].collect().toSeq === Seq(40L))
  }

  test("NB discriminative gate drops bad-corpus-like docs in the chain") {
    val good = seed.map { case (id, t, _, _) => (id, t) }
    val bad = Seq((500L, "spamword junktoken noise spamword junktoken noise"),
      (501L, "noise noise junktoken spamword buy now"))
    val nb = graft.operators.QualityClassifier.trainNb(
      good.toDF("doc_id", "text"), bad.toDF("doc_id", "text"), "text", 100)
    val cfg = CurationPipeline.CurationConfig(
      gopher = Some(graft.functions.TextAnalysis.GopherThresholds(
        minWords = 5, maxWords = 1000, minMeanWordLen = 1,
        maxMeanWordLen = 12, maxSymbolWordRatio = 1,
        minAlphaWordFrac = 0.3, minStopwordHits = 0)),
      minAvgLogodds = Some(0.0))
    val batch = Seq(
      (30L, "the quick table is fast here", vec(1, 1)),
      (31L, "spamword junktoken noise spamword junktoken", vec(1, 2)))
      .toDF("doc_id", "text", "embedding")
    val r = CurationPipeline.curateBatch(batch, cfg,
      CurationPipeline.CurationState(nb = Some(nb)))
    assert(r.admitted.select("doc_id").as[Long].collect().toSeq === Seq(30L))
  }

  test("gate chain: each planted row rejects at its own stage; states grow") {
    implicit val sqlCtx = spark.sqlContext
    val seedDf = seed.toDF("doc_id", "text", "embedding", "label")

    // persisted artifacts, the production wiring: LM + cluster state on
    // disk, lexical corpus/keys in tables
    val lmDir = java.nio.file.Files.createTempDirectory("graft-cur-lm").toString
    // LM trained on a replicated seed (the "trusted slice" is larger
    // than the gate corpus in production): the bigger N drops the OOV
    // probability far below in-vocab backoff, giving the gate a wide,
    // assertable margin
    val lmTrain = (0 until 5).map(r =>
      seed.map { case (id, t, v, l) => (id + 100L * r, t, v, l) })
      .reduce(_ ++ _).toDF("doc_id", "text", "embedding", "label")
    LanguageModel.lmSave(spark, lmDir,
      LanguageModel.trainBigram(lmTrain, "text", vocabCap = 100, bigramMinCount = 1))
    val lm = LanguageModel.lmLoad(spark, lmDir)

    val clDir = java.nio.file.Files.createTempDirectory("graft-cur-cl").toString
    val cents = Clustering.groupCentroids(seedDf, "label", "embedding")
    Clustering.clusterSave(clDir,
      Clustering.assign(seedDf.drop("label"), cents, "embedding").drop("dist"),
      cents)

    val dcfg = StreamingDedup.DedupGateConfig("doc_id", "text",
      n = 3, bands = 4, threshold = 0.5)
    var lexCorpus = seedDf.drop("embedding", "label")
    var lexKeys = Dedup.minhashBandKeys(lexCorpus, "doc_id", "text")

    // LM threshold: midpoint between the worst legitimate candidate and
    // the gibberish doc — separation asserted so the gate can't be
    // vacuously loose or tight
    val legit = Seq(goodText10, cleanText11,
      "the quick table is fast and clean today",
      "a clean merge of the fast table today",
      "the value of a batch in order is slow",
      "the neat line of value is quick here",
      goodText10)
    val scores = LanguageModel.scoreDocs(
        (legit :+ gibberish12).zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val worstLegit = scores.filterKeys(_ < legit.size).values.min
    val gib = scores(legit.size.toLong)
    assert(gib < worstLegit - 1.0,
      s"gibberish $gib must sit clearly under the legit floor $worstLegit")
    val lmThreshold = (gib + worstLegit) / 2

    val cfg = CurationPipeline.CurationConfig(
      gopher = Some(graft.functions.TextAnalysis.GopherThresholds(
        minWords = 5, maxWords = 1000, minMeanWordLen = 1,
        maxMeanWordLen = 12, maxSymbolWordRatio = 1,
        minAlphaWordFrac = 0.3, minStopwordHits = 0)),
      minAvgLogprob = Some(lmThreshold),
      lexical = Some(dcfg),
      semanticThreshold = Some(0.95))

    val stream = MemoryStream[(Long, String, Seq[Float])]
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    // one AvailableNow run per phase = one real trigger per batch, each
    // gating against the state the previous phase wrote
    def runPhase(): Unit = {
      val q = CurationPipeline.curationWriter(
        stream.toDF.toDF("doc_id", "text", "embedding"),
        cfg,
        readState = () => CurationPipeline.CurationState(
          lm = Some(LanguageModel.lmLoad(spark, lmDir)),
          lexCorpus = Some((lexCorpus, lexKeys)),
          cluster = Some(Clustering.clusterLoad(spark, clDir))),
        writeState = (admitted, keys, assigned) => {
          val adm = admitted.localCheckpoint(true)
          perBatch += adm.select("doc_id").as[Long].collect().toSet
          lexCorpus = lexCorpus.unionByName(adm.select("doc_id", "text"))
          keys.foreach(k => lexKeys = lexKeys.unionByName(k.localCheckpoint(true)))
          assigned.foreach(a =>
            Clustering.clusterAppend(spark, clDir, a.localCheckpoint(true)))
        }).start()
      q.awaitTermination(180000)
    }

    // batch 1: 10 admits; 11 admits with CLEANED text; 12 fails the LM
    // gate; 13 is an exact text duplicate of seed 1 (lexical reject —
    // certain, no banding recall question); 14 is novel text with a
    // copied seed embedding (semantic reject)
    stream.addData(
      (10L, goodText10, vec(0.5, 0.5)),
      (11L, htmlText11, vec(0.4, -0.6)),
      (12L, gibberish12, vec(-1, 0.2)),
      (13L, "the quick table is fast and clean today", vec(0.3, -0.8)),
      (14L, "a clean merge of the fast table today", vec(1, 0)))
    runPhase()

    // batch 2: 20 is an exact duplicate of batch-1-admitted 10's text;
    // 21 copies 11's embedding (semantic reject against GROWN state);
    // 22 admits
    stream.addData(
      (20L, goodText10, vec(-0.5, 0.4)),
      (21L, "the value of a batch in order is slow", vec(0.4, -0.6)),
      (22L, "the neat line of value is quick here", vec(-0.7, 0.7)))

    runPhase()

    assert(perBatch.toSeq.map(_.toSeq.sorted) === Seq(Seq(10L, 11L), Seq(22L)),
      s"per-batch admits ${perBatch.toSeq}")
    // the html doc's text reached the corpus CLEANED
    val t11 = lexCorpus.filter($"doc_id" === 11L).select("text").head.getString(0)
    assert(t11 === cleanText11)
    // cluster state grew by exactly the semantically-admitted rows
    val st = Clustering.clusterLoadState(spark, clDir)
    assert(st.counts.values.sum === 6L) // 3 seed + 10, 11, 22
    assert(st.assigned.select("doc_id").as[Long].collect().toSet ===
      Set(1L, 2L, 3L, 10L, 11L, 22L))
  }

  test("audit ledger: one row per reject, stage/reason per planted family") {
    implicit val sqlCtx = spark.sqlContext
    val seedDf = seed.toDF("doc_id", "text", "embedding", "label")
    val lmTrain = (0 until 5).map(r =>
      seed.map { case (id, t, v, l) => (id + 100L * r, t, v, l) })
      .reduce(_ ++ _).toDF("doc_id", "text", "embedding", "label")
    val lm = LanguageModel.trainBigram(lmTrain, "text",
      vocabCap = 100, bigramMinCount = 1)
    val cents = Clustering.groupCentroids(seedDf, "label", "embedding")
    val assigned = Clustering.assign(seedDf.drop("label"), cents, "embedding")
      .drop("dist")
    val lexCorpus = seedDf.drop("embedding", "label")
    val lexKeys = Dedup.minhashBandKeys(lexCorpus, "doc_id", "text")
    // threshold = measured midpoint (the gate-chain test's calibration)
    val s = LanguageModel.scoreDocs(
        Seq((0L, goodText10), (1L, gibberish12)).toDF("doc_id", "text"),
        "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(s(1L) < s(0L) - 1.0, s"separation collapsed: $s")
    val lmThreshold = (s(0L) + s(1L)) / 2
    val cfg = CurationPipeline.CurationConfig(
      gopher = Some(graft.functions.TextAnalysis.GopherThresholds(
        minWords = 5, maxWords = 1000, minMeanWordLen = 1,
        maxMeanWordLen = 12, maxSymbolWordRatio = 1,
        minAlphaWordFrac = 0.3, minStopwordHits = 0)),
      minAvgLogprob = Some(lmThreshold),
      lexical = Some(StreamingDedup.DedupGateConfig("doc_id", "text",
        n = 3, bands = 4, threshold = 0.5)),
      semanticThreshold = Some(0.95))
    val batch = Seq(
      (10L, goodText10, vec(0.5, 0.5)),                          // admits
      (12L, gibberish12, vec(-1, 0.2)),                          // LM
      (13L, "the quick table is fast and clean today", vec(0.3, -0.8)), // lexical
      (14L, "a clean merge of the fast table today", vec(1, 0)), // semantic
      (15L, "too short", vec(0, 0)))                             // gopher
      .toDF("doc_id", "text", "embedding")
    val r = CurationPipeline.curateBatchAudited(batch, cfg,
      CurationPipeline.CurationState(lm = Some(lm),
        lexCorpus = Some((lexCorpus, lexKeys)),
        cluster = Some((assigned, cents))))
    assert(r.admitted.select("doc_id").as[Long].collect().toSeq === Seq(10L))
    val ledger = r.rejects.get
      .select("doc_id", "stage", "reason").as[(Long, String, String)]
      .collect().sortBy(_._1)
    assert(ledger.map(_._1).toSeq === Seq(12L, 13L, 14L, 15L))
    val byId = ledger.map(l => l._1 -> l._2).toMap
    assert(byId(15L) === CurationPipeline.StageGopher)
    assert(byId(12L) === CurationPipeline.StageLm)
    assert(byId(13L) === CurationPipeline.StageLexical)
    assert(byId(14L) === CurationPipeline.StageSemantic)
    // reasons carry the configured thresholds
    assert(ledger.find(_._1 == 12L).get._3 === s"avg_logprob < $lmThreshold")
    assert(ledger.find(_._1 == 13L).get._3.contains("0.5"))
    // audit off → no ledger, same admitted set
    val off = CurationPipeline.curateBatch(batch, cfg,
      CurationPipeline.CurationState(lm = Some(lm),
        lexCorpus = Some((lexCorpus, lexKeys)),
        cluster = Some((assigned, cents))))
    assert(off.rejects.isEmpty)
    assert(off.admitted.select("doc_id").as[Long].collect().toSeq === Seq(10L))
    // no gates on + audit → empty ledger with the right schema
    val none = CurationPipeline.curateBatchAudited(batch,
      CurationPipeline.CurationConfig(clean = false),
      CurationPipeline.CurationState())
    assert(none.rejects.get.columns.toSeq === Seq("doc_id", "stage", "reason"))
    assert(none.rejects.get.count() === 0L)
  }
}
