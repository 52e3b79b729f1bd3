package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{DsirGramBuckets, DsirLogWeight}

/** DSIR-style data selection — importance resampling toward a TARGET
  * distribution (Xie et al., "Data Selection for Language Models via
  * Importance Resampling", NeurIPS 2023; public method). The third
  * selection family beside the generative LM-perplexity cut
  * ([[LanguageModel]]) and the discriminative NB log-odds gate
  * ([[QualityClassifier]]): here the signal is a LIKELIHOOD RATIO between
  * two hashed-n-gram bag-of-words models — "how much more target-like
  * than raw-average is this document" — and the draw is a proper sample
  * (Gumbel top-k without replacement), not a threshold, so the selected
  * set matches the target distribution in feature space instead of
  * collapsing onto the mode.
  *
  * Every stage is the 100-TB shape:
  *  - [[fit]] — ONE scan + one hash aggregate bounded by the bucket
  *    count (≤ [[MaxBuckets]], loud); the model is a bucket-count array,
  *    64 KB at the default 8k buckets.
  *  - [[scoreDocs]] — map-side codegen kernel; the log-ratio table rides
  *    the expression (the [[LanguageModel]] broadcast-model shape). No
  *    shuffle, no join.
  *  - [[resample]] — Gumbel keys are a pure function of (logw, id), so
  *    sampling k of n without replacement is a rank cut, executed as
  *    distributed threshold selection ([[Selection.topK]]) — never a
  *    single-task TakeOrdered merge at corpus-proportional k.
  *
  * Cross-engine determinism: gram order, hash, and fold order are pinned
  * by [[graft.functions.DsirFeatures]]; the Gumbel uniform comes from
  * [[Mixture.idHash]] (the engine-replayable affine hash), so a DuckDB
  * oracle replays weights AND the sampled set bit-for-bit. */
object Dsir {

  /** Bucket-count ceiling: the model collect is `buckets` rows — keep it
    * a model-sized fetch (8 MB of longs at the cap), never a data fetch. */
  val MaxBuckets: Int = 1 << 20

  /** Default feature space size (the DSIR paper uses 10k; a power of two
    * keeps the modulo cheap). */
  val DefaultBuckets: Int = 8192

  /** Hashed bag-of-words model: occurrence counts per bucket over a
    * corpus, plus the total gram count. */
  final case class BowModel(buckets: Int, counts: Array[Long], total: Long)

  /** Fit a bucket-count model over `textCol`: one scan, one hash
    * aggregate of ≤ `buckets` groups, one bounded collect. */
  def fit(df: DataFrame, textCol: String, buckets: Int = DefaultBuckets): BowModel = {
    require(buckets >= 2 && buckets <= MaxBuckets,
      s"buckets must be in [2, $MaxBuckets], got $buckets — the model " +
        "collect is one row per bucket and must stay driver-bounded")
    val rows = df.select(explode(DsirGramBuckets(col(textCol), buckets)).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__c"))
      .collect()
    val counts = new Array[Long](buckets)
    var total = 0L
    rows.foreach { r =>
      val c = r.getLong(1)
      counts(r.getInt(0)) = c
      total += c
    }
    BowModel(buckets, counts, total)
  }

  /** Fit the TARGET and RAW models in ONE corpus scan: the usual DSIR
    * setup has the target as a subset of the raw corpus (`targetPred`),
    * so fitting them separately pays a second full pass for counts the
    * first already saw. One conditional aggregate yields both count
    * tables; at 100 TB the saved scan is the dominant cost of the whole
    * weighting step. Rows failing `targetPred` count toward RAW only —
    * identical to `(fit(df.filter(p)), fit(df))` by construction. */
  def fitBoth(df: DataFrame, textCol: String, targetPred: Column,
      buckets: Int = DefaultBuckets): (BowModel, BowModel) = {
    require(buckets >= 2 && buckets <= MaxBuckets,
      s"buckets must be in [2, $MaxBuckets], got $buckets — the model " +
        "collect is one row per bucket and must stay driver-bounded")
    val rows = df
      .select(explode(DsirGramBuckets(col(textCol), buckets)).as("__b"),
        targetPred.as("__t"))
      .groupBy("__b").agg(
        count(lit(1)).as("__c"),
        count(when(col("__t"), 1)).as("__ct"))
      .collect()
    val rawC = new Array[Long](buckets)
    val tgtC = new Array[Long](buckets)
    var rawN = 0L
    var tgtN = 0L
    rows.foreach { r =>
      val b = r.getInt(0)
      rawC(b) = r.getLong(1); rawN += r.getLong(1)
      tgtC(b) = r.getLong(2); tgtN += r.getLong(2)
    }
    (BowModel(buckets, tgtC, tgtN), BowModel(buckets, rawC, rawN))
  }

  /** Per-bucket log-probability ratios `ln p_target(b) − ln p_raw(b)`
    * under add-α smoothing — the importance-weight table. Operand order
    * is pinned (quotient first, one ln each side, subtraction last) so
    * the oracle SQL replays it bit-for-bit. */
  def logRatios(target: BowModel, raw: BowModel, alpha: Double = 1.0): Array[Double] = {
    require(target.buckets == raw.buckets,
      s"bucket spaces differ: target ${target.buckets} vs raw ${raw.buckets}")
    require(alpha > 0, s"smoothing alpha must be > 0, got $alpha")
    val b = target.buckets
    val out = new Array[Double](b)
    var i = 0
    while (i < b) {
      out(i) = math.log((target.counts(i) + alpha) / (target.total + alpha * b)) -
        math.log((raw.counts(i) + alpha) / (raw.total + alpha * b))
      i += 1
    }
    out
  }

  /** Map-side importance log-weight per document: the position-ordered
    * fold of `ratios(bucket)` over the gram sequence (see
    * [[graft.functions.DsirFeatures.logWeight]]). */
  def scoreDocs(df: DataFrame, textCol: String, ratios: Array[Double],
      outCol: String = "logw"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"scoreDocs emits '$outCol'; rename the existing column")
    df.withColumn(outCol, DsirLogWeight(col(textCol), ratios))
  }

  /** Add two models bucket-wise — EXACT incremental maintenance: counts
    * are plain integers over a FIXED bucket space, so
    * `merge(fit(a), fit(b)) == fit(a ∪ b)` holds bit-for-bit with no
    * caps, no ordering rules, no lossy edge (the property
    * [[LanguageModel]]'s rank-capped `lmUpdate` can only approximate).
    * Appending a corpus batch is `merge(model, fit(batch))`. */
  def merge(a: BowModel, b: BowModel): BowModel = {
    require(a.buckets == b.buckets,
      s"bucket spaces differ: ${a.buckets} vs ${b.buckets}")
    val counts = new Array[Long](a.buckets)
    var i = 0
    while (i < a.buckets) { counts(i) = a.counts(i) + b.counts(i); i += 1 }
    BowModel(a.buckets, counts, a.total + b.total)
  }

  /** Incremental update: fold a new document batch into the model (one
    * batch scan + the exact [[merge]]). */
  def update(model: BowModel, batch: DataFrame, textCol: String): BowModel =
    merge(model, fit(batch, textCol, model.buckets))

  /** Persist a model as one exact-integer sidecar (sparse lines, the
    * [[LanguageModel.lmSave]] atomic-rename discipline): header
    * `dsir_bow <version> <buckets> <total>`, then `<bucket> <count>` for
    * occupied buckets. */
  def save(spark: org.apache.spark.sql.SparkSession, dir: String,
      model: BowModel): Unit = {
    val lines = s"dsir_bow\t1\t${model.buckets}\t${model.total}" +:
      model.counts.zipWithIndex.collect {
        case (c, b) if c != 0L => s"$b\t$c"
      }.toSeq
    graft.model.VersionedDir.writeSidecar(spark, dir, "dsir_bow.tsv", lines)
  }

  def load(spark: org.apache.spark.sql.SparkSession, dir: String): BowModel = {
    val lines = graft.model.VersionedDir.readSidecar(spark, dir, "dsir_bow.tsv")
    val h = lines.head.split("\t")
    require(h.length == 4 && h(0) == "dsir_bow" && h(1) == "1",
      s"unrecognized dsir_bow.tsv header in $dir: '${lines.head}'")
    val buckets = h(2).toInt
    val counts = new Array[Long](buckets)
    lines.tail.foreach { ln =>
      val p = ln.split("\t")
      counts(p(0).toInt) = p(1).toLong
    }
    BowModel(buckets, counts, h(3).toLong)
  }

  /** Deterministic standard-Gumbel noise from the row id:
    * `g = −ln(−ln u)` with `u = (idHash(id) + 0.5) / P` ∈ (0, 1) — the
    * exponential-race spelling of sampling without replacement. Adding
    * `g` to a log-weight and keeping the top k draws k rows with
    * probability proportional to `exp(logw)` (the Gumbel-max trick),
    * replayable because u is [[Mixture.idHash]]. */
  def gumbelNoise(id: Column): Column =
    -log(-log((Mixture.idHash(id) + lit(0.5)) / lit(Mixture.HashP.toDouble)))

  /** The DuckDB spelling of [[gumbelNoise]] — one definition, every
    * oracle (the [[Mixture.idHashSql]] discipline). */
  def gumbelNoiseSql(idExpr: String): String =
    s"(- ln(- ln((${Mixture.idHashSql(idExpr)} + 0.5) / ${Mixture.HashP}.0)))"

  /** Sample `k` of n without replacement, probability ∝ exp(`weightCol`):
    * key = logw + Gumbel(id), cut at rank k by distributed threshold
    * selection. The kept SET equals
    * `orderBy(desc(key), asc(id)).limit(k)` by [[Selection.topK]]'s
    * contract — which is exactly the oracle spelling — without the
    * single-task merge. */
  def resample(scored: DataFrame, idCol: String, weightCol: String,
      k: Long, keyCol: String = "__gkey"): DataFrame = {
    Mixture.requireIntegralId(scored, idCol, "resample")
    require(!scored.columns.contains(keyCol),
      s"resample reserves '$keyCol'; rename the existing column")
    val keyed = scored.withColumn(keyCol,
      col(weightCol) + gumbelNoise(col(idCol)))
    Selection.topK(keyed, keyCol, idCol, k).drop(keyCol)
  }
}
