package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Discriminative quality filtering — the fastText/CCNet-shape classifier
  * (Wenzek et al. 2020 §4.3; the GPT-3 pipeline's "quality classifier"):
  * score each document by the log-likelihood ratio of its tokens under a
  * GOOD corpus versus a BAD corpus, Naive-Bayes with add-one smoothing.
  * The generative sibling is [[LanguageModel]] (perplexity against one
  * trusted slice); real pipelines run both.
  *
  * Scale shape mirrors the LM: training is one hash-agg per class whose
  * shuffle is DISTINCT TERMS, rank-capped so the model is bounded by
  * contract (driver materialization is a model fetch); scoring is one
  * tokenized scan + one broadcast join + a per-doc hash agg. Tokens
  * outside the capped vocabulary contribute NOTHING at scoring (the
  * classic ignore-unknown contract — a vocabulary miss is evidence for
  * neither class), so the broadcast join is inner and the plan never
  * manufactures rows for misses.
  *
  * Determinism (DuckDB-oracled in [[graft.queries.LmQueries]]):
  * per-token log-odds is `ln((cg+1)/(Ng+V)) − ln((cb+1)/(Nb+V))` — the
  * same expression tree both engines — summed in POSITION order (the
  * [[LanguageModel]] fold), counts and the vocab rank cut exact
  * integers. */
object QualityClassifier {

  /** A trained model: per-vocab-term class counts plus the smoothing
    * denominators. All integers — persistence/round-trips are exact. */
  final case class NbModel(
      terms: Seq[(String, Long, Long)], // (term, goodCount, badCount)
      goodTotal: Long, badTotal: Long, vocabCap: Int) {
    /** |V| — the smoothing constant is the CAPPED vocabulary size. */
    def vocabSize: Int = terms.size
    def termDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      terms.toDF("term", "cg", "cb")
    }
  }

  /** Train on a good slice vs a bad slice: vocabulary = top `vocabCap`
    * terms by combined count (ties by term), class counts per kept term,
    * totals over ALL tokens of each class (the denominator sees the full
    * class mass, not just the kept vocabulary). */
  def trainNb(good: DataFrame, bad: DataFrame, textCol: String,
      vocabCap: Int): NbModel = {
    def counts(df: DataFrame) = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val g = counts(good)
    val b = counts(bad)
    val gTotal = g.agg(coalesce(sum("cnt"), lit(0L))).head.getLong(0)
    val bTotal = b.agg(coalesce(sum("cnt"), lit(0L))).head.getLong(0)
    val rows = g.select(col("term"), col("cnt").as("cg"))
      .join(b.select(col("term"), col("cnt").as("cb")), Seq("term"), "full_outer")
      .select(col("term"), coalesce(col("cg"), lit(0L)).as("cg"),
        coalesce(col("cb"), lit(0L)).as("cb"),
        (coalesce(col("cg"), lit(0L)) + coalesce(col("cb"), lit(0L))).as("total"))
      .orderBy(desc("total"), asc("term")).limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    NbModel(rows.toSeq.sortBy(_._1), gTotal, bTotal, vocabCap)
  }

  /** Persist a trained model as one atomically-swapped tab-separated
    * file — every field is a token string (no whitespace) or an integer,
    * so the round-trip is exact ([[LanguageModel.lmSave]] protocol). */
  def nbSave(spark: SparkSession, dir: String, m: NbModel): Unit =
    graft.model.VersionedDir.writeSidecar(spark, dir, "nb_model.tsv",
      s"${m.goodTotal}\t${m.badTotal}\t${m.vocabCap}" +:
        m.terms.map { case (t, g, b) => s"$t\t$g\t$b" })

  /** Load a persisted model ([[nbSave]]). */
  def nbLoad(spark: SparkSession, dir: String): NbModel = {
    val lines = graft.model.VersionedDir.readSidecar(spark, dir, "nb_model.tsv")
    val h = lines.head.split("\t")
    NbModel(lines.tail.map { ln =>
      val p = ln.split("\t")
      require(p.length == 3, s"corrupt nb_model.tsv line '$ln' in $dir")
      (p(0), p(1).toLong, p(2).toLong)
    }, h(0).toLong, h(1).toLong, h(2).toInt)
  }

  /** Score every document: `(idCol, n_hit, logodds, avg_logodds)` where
    * `n_hit` counts the vocabulary tokens (unknown tokens contribute
    * nothing) and `logodds` folds per-position log-likelihood ratios in
    * position order. Positive → good-like. Zero-hit docs score 0. */
  /** Reserved scoring columns ([[LanguageModel.ScoringReserved]]
    * convention). */
  val ScoringReserved: Set[String] = Set("pos", "w", "cg", "cb", "lp",
    "__tk", "arr", "n_hit", "logodds", "avg_logodds")

  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      model: NbModel, passthrough: Seq[String] = Nil): DataFrame = {
    // lower-cased compare — Spark's default case-insensitive resolution
    // would silently capture an id column spelled `Pos` (ADVICE r9)
    val clash = (idCol +: passthrough)
      .filter(n => ScoringReserved.contains(n.toLowerCase))
    require(clash.isEmpty,
      s"scoreDocs reserves columns ${ScoringReserved.mkString(", ")} — " +
        s"rename ${clash.mkString(", ")} before scoring")
    // ONE map-side kernel walk per document (r13, guide §4 — the
    // LanguageModel.scoreDocs twin): per-term log-odds are constant under
    // a fixed model, so they precompute driver-side and scoring needs no
    // explode, no broadcast join, no groupBy(id) exchange.
    // [[scoreDocsExpanded]] keeps the DataFrame spelling as the
    // executable spec; NbKernelParitySpec pins bit-exact parity.
    val keep = passthrough.map(col)
    val sc = graft.functions.NbScoreExpr(
      TextAnalysis.tokens(col(textCol)), graft.functions.NbKernel.model(model))
    docs.select(col(idCol) +: keep :+ sc.as("__s"): _*)
      .select(col(idCol) +: keep :+ col("__s.n_hit").as("n_hit") :+
        col("__s.logodds").as("logodds") :+
        col("__s.avg_logodds").as("avg_logodds"): _*)
  }

  /** The expanded DataFrame spelling of [[scoreDocs]] — semantically
    * identical, kept as the executable cross-check spec. */
  private[graft] def scoreDocsExpanded(docs: DataFrame, idCol: String,
      textCol: String, model: NbModel,
      passthrough: Seq[String] = Nil): DataFrame = {
    val spark = docs.sparkSession
    val keep = passthrough.map(col)
    val v = lit(model.vocabSize).cast("double")
    val ng = lit(model.goodTotal).cast("double")
    val nb = lit(model.badTotal).cast("double")

    val tk = docs.select(col(idCol) +: keep :+
      TextAnalysis.tokens(col(textCol)).as("__tk"): _*)
    val posArr = when(size(col("__tk")) === 0,
        array().cast("array<struct<pos:int,w:string>>"))
      .otherwise(transform(sequence(lit(1), size(col("__tk"))),
        i => struct(i.as("pos"), element_at(col("__tk"), i).as("w"))))
    val pos = tk.select(col(idCol) +: keep :+ explode_outer(posArr).as("p"): _*)
      .select(col(idCol) +: keep :+ col("p.pos").as("pos") :+
        col("p.w").as("w"): _*)
    val lp = log((col("cg").cast("double") + lit(1d)) / (ng + v)) -
      log((col("cb").cast("double") + lit(1d)) / (nb + v))
    // LEFT join (not inner): the outer-explode null row for zero-token
    // docs must survive to the agg; non-vocab tokens yield a null lp the
    // collect_list guard drops
    pos.join(broadcast(model.termDf(spark).withColumnRenamed("term", "w")),
        Seq("w"), "left")
      .select(col(idCol) +: keep :+ col("pos") :+
        when(col("cg").isNotNull || col("cb").isNotNull, lp).as("lp"): _*)
      .groupBy(col(idCol) +: keep: _*)
      .agg(sort_array(collect_list(
        when(col("pos").isNotNull && col("lp").isNotNull,
          struct(col("pos"), col("lp"))))).as("arr"))
      .select(col(idCol) +: keep :+ size(col("arr")).as("n_hit") :+
        aggregate(transform(col("arr"), x => x.getField("lp")),
          lit(0d), (a, x) => a + x).as("logodds"): _*)
      .select(col(idCol) +: keep :+ col("n_hit") :+ col("logodds") :+
        when(col("n_hit") > 0, col("logodds") / col("n_hit"))
          .otherwise(lit(0d)).as("avg_logodds"): _*)
  }
}
