package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.functions.{TextAnalysis, TextClean}
import graft.operators.{Clustering, LanguageModel, QualityClassifier}

/** The production curation shape, composed: every micro-batch flows
  * clean → quality gates (Gopher, LM perplexity) → lexical near-dup gate
  * → semantic near-dup gate, and the SURVIVORS maintain the states the
  * next batch gates against (band-key index, cluster state) — the
  * end-to-end counterpart of the single-family writers
  * ([[StreamingDedup.dedupedAppendWriter]], `Ingest.upsertWriter`).
  *
  * Composition discipline:
  *  - per-document stages (clean, Gopher, LM score) are MAP-SIDE column
  *    pipelines fused into one pass over the batch — no action, no
  *    shuffle, before the first stateful gate sees a row;
  *  - the stateful gates run in fixed order (lexical before semantic:
  *    text dedup is the cheaper reject) and each touches state only for
  *    banded/clustered candidates, per their own contracts;
  *  - ALL per-batch models and states are read ONCE per trigger through
  *    injected readers (the persisted-artifact pattern: `lmLoad`,
  *    `clusterLoadState`, band-key tables), so a batch gates against one
  *    consistent snapshot;
  *  - stage order is admission-monotone: a row dropped by stage k is
  *    never seen by stage k+1, so per-stage reject reasons are disjoint
  *    and the admitted set is order-independent across the per-document
  *    stages.
  */
object CurationPipeline {

  /** Gate chain configuration; `None` disables a stage. */
  final case class CurationConfig(
      idCol: String = "doc_id",
      textCol: String = "text",
      featureCol: String = "embedding",
      clean: Boolean = true,
      gopher: Option[TextAnalysis.GopherThresholds] = None,
      /** Keep docs with mean token log-probability ≥ this (scored under
        * the injected LM). */
      minAvgLogprob: Option[Double] = None,
      /** Keep docs with mean token log-odds ≥ this (scored under the
        * injected NB model — the discriminative quality gate; both
        * quality gates may run, each against its own artifact). */
      minAvgLogodds: Option[Double] = None,
      /** Keep docs with DSIR importance log-weight ≥ this (scored under
        * the injected log-ratio table — the target-distribution gate,
        * the streaming face of [[graft.operators.Dsir]]). Purely
        * map-side: one codegen kernel, no join, no action. */
      minDsirLogw: Option[Double] = None,
      lexical: Option[StreamingDedup.DedupGateConfig] = None,
      semanticThreshold: Option[Double] = None)

  /** The states one trigger reads and the survivors extend. Fields are
    * `null`-free but only consulted when the matching stage is on. */
  final case class CurationState(
      lm: Option[LanguageModel.BigramLM] = None,
      nb: Option[QualityClassifier.NbModel] = None,
      /** DSIR per-bucket log-ratio table ([[graft.operators.Dsir
        * .logRatios]] over persisted target/raw models). */
      dsir: Option[Array[Double]] = None,
      lexCorpus: Option[(DataFrame, DataFrame)] = None,
      cluster: Option[(DataFrame, Array[Clustering.Centroid])] = None)

  /** One micro-batch through the gate chain. Returns the admitted rows
    * (original columns, cleaned text if `clean`; plus `cluster` when the
    * semantic stage ran) and, for the stateful stages, the artifacts the
    * caller appends to state: the admitted rows' band keys and the
    * cluster-assigned rows. */
  final case class CurationResult(
      admitted: DataFrame,
      lexKeys: Option[DataFrame],
      assigned: Option[DataFrame])

  def curateBatch(batch: DataFrame, cfg: CurationConfig,
      state: CurationState): CurationResult = {
    // ---- per-document map-side stages: one fused pass, no action ----
    val cleaned =
      if (cfg.clean)
        batch.withColumn(cfg.textCol, TextClean.cleanText(col(cfg.textCol)))
      else batch
    val gophered = cfg.gopher.fold(cleaned)(t =>
      cleaned.filter(TextAnalysis.gopherGate(col(cfg.textCol), t)))
    val scored = cfg.minAvgLogprob.fold(gophered) { min =>
      val lm = state.lm.getOrElse(throw new IllegalArgumentException(
        "minAvgLogprob set but no LM in CurationState — load one with LanguageModel.lmLoad"))
      // batch-local join back by id (the batch is one trigger's rows,
      // not the corpus — the scoreDocs passthrough trick is for
      // corpus-sized scoring, not needed here)
      val s = LanguageModel.scoreDocs(gophered, cfg.idCol, cfg.textCol, lm)
        .filter(col("avg_logprob") >= min).select(col(cfg.idCol))
      gophered.join(s, Seq(cfg.idCol), "left_semi")
    }
    val dsirGated = cfg.minDsirLogw.fold(scored) { min =>
      val ratios = state.dsir.getOrElse(throw new IllegalArgumentException(
        "minDsirLogw set but no ratio table in CurationState — build one " +
          "with Dsir.logRatios over persisted models (Dsir.load)"))
      scored.filter(
        graft.functions.DsirLogWeight(col(cfg.textCol), ratios) >= min)
    }
    val classified = cfg.minAvgLogodds.fold(dsirGated) { min =>
      val nb = state.nb.getOrElse(throw new IllegalArgumentException(
        "minAvgLogodds set but no NB model in CurationState — load one with QualityClassifier.nbLoad"))
      val q = QualityClassifier.scoreDocs(dsirGated, cfg.idCol, cfg.textCol, nb)
        .filter(col("avg_logodds") >= min).select(col(cfg.idCol))
      dsirGated.join(q, Seq(cfg.idCol), "left_semi")
    }

    // ---- stateful gates, cheap-reject first ----
    val (lexAdmitted, lexKeys) = cfg.lexical match {
      case None => (classified, None)
      case Some(dcfg) =>
        val (corpus, keys) = state.lexCorpus.getOrElse(
          throw new IllegalArgumentException(
            "lexical gate on but no corpus/keys in CurationState"))
        // admitWithKeys hands back the survivors' band keys from the one
        // signature pass the gate already ran — no re-shingle
        val (novel, novelKeys) =
          StreamingDedup.admitWithKeys(classified, corpus, keys, dcfg)
        (novel, Some(novelKeys))
    }
    cfg.semanticThreshold match {
      case None => CurationResult(lexAdmitted, lexKeys, None)
      case Some(th) =>
        val (assignedCorpus, cents) = state.cluster.getOrElse(
          throw new IllegalArgumentException(
            "semantic gate on but no cluster state in CurationState"))
        val admitted = Clustering.admitSemantic(lexAdmitted, assignedCorpus,
          cents, cfg.idCol, cfg.featureCol, th)
        CurationResult(admitted, lexKeys, Some(admitted))
    }
  }

  /** The foreachBatch writer: read every state once, run the chain,
    * hand the survivors back for state maintenance. `writeState`
    * receives (admitted, band keys or empty, assigned rows or empty). */
  def curationWriter(updates: DataFrame, cfg: CurationConfig,
      readState: () => CurationState,
      writeState: (DataFrame, Option[DataFrame], Option[DataFrame]) => Unit)
      : DataStreamWriter[Row] = {
    updates.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val r = curateBatch(batch, cfg, readState())
        writeState(r.admitted, r.lexKeys, r.assigned)
      }
  }
}
