package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training and application (Kudo 2018,
  * "Subword Regularization"; the SentencePiece `--model_type=unigram`
  * recipe) — the second of the two public subword algorithms, beside
  * [[Bpe]]. A piece vocabulary with probabilities is fit by EM over the
  * word-frequency dictionary; application is per-token Viterbi under
  * the learned log-probabilities.
  *
  * Scale shape follows the [[Bpe]] split-by-grain discipline: the
  * distributed half is [[Bpe.wordFreq]] (one tokenize + hash-agg whose
  * shuffle is DISTINCT WORD TYPES, rank-capped → bounded dictionary)
  * plus ONE broadcast scoring pass per EM iteration ([[expectedCounts]]:
  * the piece table ships to executors, each word runs forward–backward
  * locally, the shuffle is CANDIDATE PIECES); the M-step is a driver
  * normalization over the capped candidate table. Application is the
  * map-side [[graft.functions.SpmSegmentToken]] kernel (the
  * [[graft.functions.BpeSegmentToken]] pattern) — no UDF, no shuffle.
  *
  * Determinism (DuckDB-oracled in [[graft.queries.SpmQueries]]): the
  * candidate table is exact integers under a total order (count desc,
  * piece asc; single code points always kept for coverage); EM runs in
  * PROBABILITY space — only +,×,÷ on doubles, no transcendentals — so
  * cross-engine drift is summation-order ULPs (~1e-13 relative), far
  * under the 6-decimal output rounding; Viterbi ties are the total
  * order (score, fewer pieces, larger split point), and the oracle's
  * apply model uses DYADIC log-probs so score sums are bit-exact. */
object Spm {

  /** Log-probability charged to an out-of-vocabulary single code point
    * at apply time (a real corpus always contains characters the
    * training dictionary never saw). Dyadic, so oracle score sums stay
    * exact. */
  val UnkLogProb: Double = -16.0

  /** A fitted model: candidate pieces with probabilities, piece-asc.
    * All pieces have prob > 0 (every candidate occurs in the training
    * dictionary by construction). */
  final case class SpmModel(
      pieces: Seq[(String, Double)],
      maxPieceLen: Int) {
    require(pieces.map(_._1) == pieces.map(_._1).sorted,
      "SpmModel.pieces must be piece-ascending")
    def logProbs: Seq[(String, Double)] =
      pieces.map { case (p, pr) => (p, math.log(pr)) }
  }

  private[operators] def codePointSubstrings(w: String, nMax: Int)
      : Iterator[(String, Int, Int)] = {
    // (piece, startCp, endCp) with 1-based inclusive cp positions
    val starts = {
      val b = Array.newBuilder[Int]
      var i = 0
      while (i < w.length) { b += i; i += Character.charCount(w.codePointAt(i)) }
      b += w.length
      b.result()
    }
    val n = starts.length - 1
    for {
      j <- Iterator.range(0, n)
      len <- Iterator.range(1, math.min(nMax, n - j) + 1)
    } yield (w.substring(starts(j), starts(j + len)), j + 1, j + len)
  }

  private[operators] def cpCount(w: String): Int =
    w.codePointCount(0, w.length)

  /** Candidate piece table over a word-frequency dictionary: every code
    * point substring of length 1..`maxPieceLen`, weighted by word count
    * (overlapping occurrences all count), kept if its rank under
    * (weight desc, piece asc) is ≤ `candCap` OR it is a single code
    * point (coverage: every word must stay segmentable). Words longer
    * than `maxWordLen` code points are excluded from training — the
    * lattice cost is quadratic in word length and the tail of a capped
    * dictionary carries no mass worth it. */
  def candidates(freq: Seq[(String, Long)], maxWordLen: Int,
      maxPieceLen: Int, candCap: Int): Seq[(String, Long)] = {
    require(maxPieceLen >= 1 && candCap >= 1 && maxWordLen >= 1)
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    freq.foreach { case (w, c) =>
      if (cpCount(w) <= maxWordLen)
        codePointSubstrings(w, maxPieceLen).foreach { case (p, _, _) =>
          counts.update(p, counts.getOrElse(p, 0L) + c)
        }
    }
    val ranked = counts.toSeq.sortBy { case (p, c) => (-c, p) }
    val kept = ranked.zipWithIndex.collect {
      case ((p, c), i) if i < candCap || cpCount(p) == 1 => (p, c)
    }
    kept.sortBy(_._1)
  }

  /** Initial model: relative frequency of the candidate weights. */
  def initModel(cands: Seq[(String, Long)], maxPieceLen: Int): SpmModel = {
    // fail at the CAUSE (ADVICE r11): an empty candidate table — an
    // empty corpus, or every word type past maxWordLen — would
    // otherwise surface far downstream as SpmSegment's opaque
    // 'empty piece table'
    require(cands.nonEmpty,
      "initModel: empty candidate table — the corpus is empty or every " +
        "word type exceeds maxWordLen; nothing to train a unigram LM on")
    val total = cands.map(_._2).sum.toDouble
    SpmModel(cands.map { case (p, c) => (p, c.toDouble / total) }, maxPieceLen)
  }

  /** Forward–backward expected piece counts of ONE word under the
    * model, weight `cnt` — probability space (words are ≤ maxWordLen
    * pieces, no underflow). Shared by the distributed E-step and the
    * suite's independent replay. */
  private[operators] def wordExpectations(w: String, cnt: Long,
      p: collection.Map[String, Double], maxPieceLen: Int)
      : Seq[(String, Double)] = {
    val occs = codePointSubstrings(w, maxPieceLen)
      .filter { case (piece, _, _) => p.contains(piece) }.toArray
    val n = cpCount(w)
    val alpha = new Array[Double](n + 1)
    val beta = new Array[Double](n + 2)
    alpha(0) = 1d
    var i = 1
    while (i <= n) {
      var s = 0d
      occs.foreach { case (piece, j, e) =>
        if (e == i) s += alpha(j - 1) * p(piece)
      }
      alpha(i) = s
      i += 1
    }
    beta(n + 1) = 1d
    // beta(j) = mass of suffix starting at cp j (1-based); beta(n+1)=1
    var j = n
    while (j >= 1) {
      var s = 0d
      occs.foreach { case (piece, js, e) =>
        if (js == j) s += p(piece) * beta(e + 1)
      }
      beta(j) = s
      j -= 1
    }
    val z = alpha(n)
    if (z == 0d) Seq.empty
    else occs.toSeq.map { case (piece, js, e) =>
      (piece, cnt * alpha(js - 1) * p(piece) * beta(e + 1) / z)
    }
  }

  /** One distributed E-step: the model broadcasts with the closure, each
    * word of the (bounded) dictionary runs forward–backward locally, and
    * the shuffle carries only (piece, contribution) rows — grouped,
    * summed, fetched (bounded by the candidate cap). */
  def expectedCounts(spark: SparkSession, freq: Seq[(String, Long)],
      model: SpmModel, maxWordLen: Int): Seq[(String, Double)] = {
    import spark.implicits._
    val pm = model.pieces.toMap
    val L = model.maxPieceLen
    val wl = maxWordLen
    // the dictionary arrives as a driver Seq (LocalRelation = ONE task);
    // spread the lattice work across the cluster — the whole point of
    // the distributed E-step
    freq.toDS()
      .repartition(spark.sparkContext.defaultParallelism)
      .filter(w => cpCount(w._1) <= wl)
      .flatMap { case (w, c) => wordExpectations(w, c, pm, L) }
      .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .collect().toSeq.map { case (p, e) => (p, e) }.sortBy(_._1)
  }

  /** M-step: renormalize expected counts. The piece set is the FIXED
    * candidate table (every candidate keeps positive mass — it occurs in
    * at least one word whose posterior paths all carry positive
    * probability), so EM iterations never change the support. */
  def mStep(exp: Seq[(String, Double)], maxPieceLen: Int): SpmModel = {
    val total = exp.map(_._2).sum
    SpmModel(exp.map { case (p, e) => (p, e / total) }, maxPieceLen)
  }

  /** Fit by `iters` EM rounds over the capped dictionary. */
  def train(docs: DataFrame, textCol: String, maxWordTypes: Int,
      maxWordLen: Int = 12, maxPieceLen: Int = 4, candCap: Int = 400,
      iters: Int = 2): SpmModel = {
    require(iters >= 0)
    val spark = docs.sparkSession
    val freq = Bpe.wordFreq(docs, textCol, maxWordTypes)
    var m = initModel(candidates(freq, maxWordLen, maxPieceLen, candCap),
      maxPieceLen)
    var k = 0
    while (k < iters) {
      m = mStep(expectedCounts(spark, freq, m, maxWordLen), maxPieceLen)
      k += 1
    }
    m
  }

  /** Prune to the top `vocabSize` pieces by (prob desc, piece asc),
    * ALWAYS keeping single code points (coverage), and renormalize —
    * the final tokenizer vocabulary with log-probs for Viterbi. */
  def vocab(model: SpmModel, vocabSize: Int): Seq[(String, Double)] = {
    require(vocabSize >= 1)
    val ranked = model.pieces.sortBy { case (p, pr) => (-pr, p) }
    val kept = ranked.zipWithIndex.collect {
      case ((p, pr), i) if i < vocabSize || cpCount(p) == 1 => (p, pr)
    }
    val total = kept.map(_._2).sum
    kept.map { case (p, pr) => (p, math.log(pr / total)) }.sortBy(_._1)
  }

  /** Independent driver-side Viterbi segmenter — the executable spec of
    * the [[graft.functions.SpmSegmentToken]] kernel (SpmSpec pins
    * equality on random corpora): maximize (Σ logprob, fewer pieces,
    * larger last split), unknown single code points at [[UnkLogProb]]. */
  def segmentWord(w: String, lp: collection.Map[String, Double],
      maxPieceLen: Int): Seq[String] = {
    val starts = {
      val b = Array.newBuilder[Int]
      var i = 0
      while (i < w.length) { b += i; i += Character.charCount(w.codePointAt(i)) }
      b += w.length
      b.result()
    }
    val n = starts.length - 1
    if (n == 0) return Seq.empty
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val np = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    score(0) = 0d
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (score(j) != Double.NegativeInfinity) {
          val piece = w.substring(starts(j), starts(i))
          val plp = lp.get(piece) match {
            case Some(v) => v
            case None => if (i - j == 1) UnkLogProb else Double.NaN
          }
          if (!plp.isNaN) {
            val s = score(j) + plp
            val cand = np(j) + 1
            val better = s > score(i) ||
              (s == score(i) && (cand < np(i) ||
                (cand == np(i) && j >= back(i))))
            if (better) { score(i) = s; np(i) = cand; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    val out = List.newBuilder[String]
    val rev = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) {
      rev += w.substring(starts(back(k)), starts(k))
      k = back(k)
    }
    out ++= rev.reverse
    out.result()
  }

  /** Per-token Viterbi segmentation of every whitespace token of
    * `text`, under fixed log-probs: `array<array<string>>` (one piece
    * array per token), via the map-side kernel. */
  def segmentTokens(text: Column, logProbs: Seq[(String, Double)],
      maxPieceLen: Int): Column =
    transform(graft.functions.TextAnalysis.tokens(text),
      t => graft.functions.SpmSegmentToken(t, logProbs, maxPieceLen))

  /** Subword count per document under the learned vocabulary. */
  def spmTokenCount(text: Column, logProbs: Seq[(String, Double)],
      maxPieceLen: Int): Column =
    aggregate(segmentTokens(text, logProbs, maxPieceLen), lit(0L),
      (acc, seg) => acc + size(seg))

  /** Persist a model as one atomically-swapped TSV — pieces carry no
    * whitespace (tokenizer grain), probs round-trip exactly through
    * `Double.toString`/`parseDouble`. */
  def spmSave(spark: SparkSession, dir: String, m: SpmModel): Unit =
    graft.model.VersionedDir.writeSidecar(spark, dir, "spm_model.tsv",
      s"${m.maxPieceLen}" +:
        m.pieces.map { case (p, pr) => s"$p\t$pr" })

  /** Load a persisted model ([[spmSave]]). */
  def spmLoad(spark: SparkSession, dir: String): SpmModel = {
    val lines = graft.model.VersionedDir.readSidecar(spark, dir, "spm_model.tsv")
    require(lines.nonEmpty, s"corrupt spm_model.tsv in $dir")
    SpmModel(lines.tail.map { ln =>
      val p = ln.split("\t")
      require(p.length == 2, s"corrupt spm_model.tsv line '$ln' in $dir")
      (p(0), p(1).toDouble)
    }, lines.head.toInt)
  }
}
