package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the
  * DATA-DEPENDENT sibling of [[Ann.rpEncode]]'s random projection
  * (Johnson–Lindenstrauss preserves distances obliviously; PCA finds the
  * directions the corpus actually varies in, the standard pre-reduction
  * before clustering/SemDeDup and the cheap whitening step for embedding
  * pipelines).
  *
  * Scale shape (the 100-TB contract):
  *  - FIT is ONE corpus scan: each row packs `[1, x_1..x_d, upper-triangle
  *    x_i·x_j]` into a single array, a posexplode + hash agg sums it
  *    element-wise (map-side partial aggregation reduces every partition
  *    to `1 + d + d(d+1)/2` rows before the shuffle — the shuffle carries
  *    O(partitions · d²) skinny rows, independent of corpus size), and
  *    the driver assembles mean + covariance from the bounded fetch and
  *    eigensolves the d×d matrix locally (cyclic Jacobi — d ≤
  *    [[MaxFitDim]] by loud contract, so the driver work is O(d³)
  *    micro-scale).
  *  - TRANSFORM is embarrassingly parallel: a per-row `(x − μ)ᵀ·V_k`
  *    against broadcast literal arrays, O(k·d) flops, no shuffle.
  *
  * Determinism: the distributed covariance sums are float accumulations
  * (partition-order-dependent last ulps), so fitted components are NOT
  * bit-replayable in SQL — PCA queries use the verification-literal
  * oracle class (`text_vocab_approx` / `ann_*` pattern): in-query checks
  * prove orthonormality, eigen-residual, projected-variance == eigenvalue
  * and decorrelation, and the oracle pins the booleans TRUE. The
  * TRANSFORM given a model is a plain ordered fold, and the model
  * round-trips exactly through [[pcaSave]]/[[pcaLoad]] (doubles as
  * `toString`/`toDouble`, lossless for finite values). */
object Pca {

  /** Loud bound on the fit dimensionality: the packed row is
    * O(d²) elements and the driver eigensolve O(d³) — at d = 512 that is
    * a 131k-element pack and a ~134M-flop solve (fine); beyond it, pick a
    * random-projection pre-reduction ([[Ann.rpEncode]]) first. */
  val MaxFitDim = 512

  /** A fitted PCA basis: `mean` (length d), `components` (k rows × d,
    * orthonormal, descending eigenvalue), `eigenvalues` (length k,
    * SAMPLE covariance eigenvalues — divisor n−1), `totalVariance`
    * (trace of the sample covariance — Σ over ALL d eigenvalues, so
    * `eigenvalues.map(_ / totalVariance)` is the explained-variance
    * ratio). Sign canon: each component's largest-|coefficient| entry is
    * non-negative (first such index on ties). */
  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      totalVariance: Double) {
    def dim: Int = mean.length
    def k: Int = components.length
  }

  /** Fit a k-component PCA on `featureCol` (array<float/double>) — one
    * corpus scan, bounded shuffle, driver-local eigensolve (see object
    * scaladoc). Requires n ≥ 2 rows and 1 ≤ k ≤ d ≤ [[MaxFitDim]]. */
  def fit(data: DataFrame, featureCol: String, k: Int): PcaModel = {
    val dimRow = data.select(size(col(featureCol))).head
    val d = dimRow.getInt(0)
    require(d >= 1 && d <= MaxFitDim,
      s"PCA fit dim $d outside [1, $MaxFitDim] — pre-reduce with " +
        "Ann.rpEncode (JL) before fitting at higher ambient dims")
    require(k >= 1 && k <= d, s"k=$k must be in [1, d=$d]")

    val v = col(featureCol).cast("array<double>")
    // packed statistics row: [n, x_1..x_d, x_i*x_j for i <= j]
    val firsts = transform(sequence(lit(1), lit(d)), i => element_at(v, i))
    val tri = flatten(transform(sequence(lit(1), lit(d)), i =>
      transform(sequence(i, lit(d)), j =>
        element_at(v, i) * element_at(v, j))))
    val packed = concat(array(lit(1d)), firsts, tri)
    // posexplode + hash agg: map-side combine folds each partition to
    // 1 + d + d(d+1)/2 rows; the driver fetch is d-bounded by contract
    val sums = data.select(posexplode(packed).as(Seq("pos", "x")))
      .groupBy("pos").agg(sum(col("x")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

    val n = sums(0)
    require(n >= 2, s"PCA fit needs at least 2 rows, got ${n.toLong}")
    val mean = Array.tabulate(d)(i => sums(1 + i) / n)
    // sample covariance from raw second moments:
    // cov_ij = (Σ x_i x_j − n·μ_i·μ_j) / (n − 1)
    val cov = Array.ofDim[Double](d, d)
    var p = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (sums(p) - n * mean(i) * mean(j)) / (n - 1d)
        cov(i)(j) = c; cov(j)(i) = c
        p += 1; j += 1
      }
      i += 1
    }
    val trace = (0 until d).map(i => cov(i)(i)).sum

    val (valsAll, vecsAll) = jacobiEigen(cov)
    // descending eigenvalue, index tie-break, canonical sign
    val order = valsAll.zipWithIndex.sortBy { case (ev, idx) => (-ev, idx) }
    val comps = order.take(k).map { case (_, idx) =>
      val vct = vecsAll.map(_(idx))
      val m = vct.indices.maxBy(ii => (math.abs(vct(ii)), -ii))
      if (vct(m) < 0) vct.map(-_) else vct
    }
    PcaModel(mean, comps.toArray, order.take(k).map(_._1).toArray, trace)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with eigenvector i in COLUMN i).
    * Deterministic sweep order; converges quadratically — 30 sweeps is
    * far past machine precision for d ≤ [[MaxFitDim]]. */
  private[operators] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val vv = Array.tabulate(d, d)((i, j) => if (i == j) 1d else 0d)
    val eps = 1e-14 * math.max(1d,
      (0 until d).map(i => math.abs(a(i)(i))).sum)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 30 && off > eps) {
      off = 0d
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > eps * 1e-3) {
            // classic 2×2 rotation (Golub & Van Loan §8.4)
            val theta = (a(q)(q) - a(p)(p)) / (2d * apq)
            val t =
              (if (theta >= 0) 1d else -1d) /
                (math.abs(theta) + math.sqrt(theta * theta + 1d))
            val c = 1d / math.sqrt(t * t + 1d)
            val s = t * c
            var ii = 0
            while (ii < d) {
              val aip = a(ii)(p); val aiq = a(ii)(q)
              a(ii)(p) = c * aip - s * aiq
              a(ii)(q) = s * aip + c * aiq
              ii += 1
            }
            var jj = 0
            while (jj < d) {
              val apj = a(p)(jj); val aqj = a(q)(jj)
              a(p)(jj) = c * apj - s * aqj
              a(q)(jj) = s * apj + c * aqj
              val vip = vv(jj)(p); val viq = vv(jj)(q)
              vv(jj)(p) = c * vip - s * viq
              vv(jj)(q) = s * vip + c * viq
              jj += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), vv)
  }

  /** Column name for the projected vector ([[pcaEncode]] output). */
  val PcaCol = "__pca"

  /** Project `vec` onto the fitted basis: output j is the ascending-i
    * ordered fold `Σ_i (x_i − μ_i)·V[j][i]` — the same fold
    * [[projectLocal]] and any replay spell. */
  def project(vec: Column, model: PcaModel): Column = {
    val mu = typedLit(model.mean.toSeq)
    val comps = typedLit(model.components.map(_.toSeq).toSeq)
    transform(sequence(lit(1), lit(model.k)), j =>
      aggregate(sequence(lit(1), lit(model.dim)),
        lit(0d), (acc, i) =>
          acc + (element_at(vec, i).cast("double") -
            element_at(mu, i)) * element_at(element_at(comps, j), i)))
  }

  /** Driver-side twin of [[project]] (same fold order). */
  def projectLocal(vec: Seq[Float], model: PcaModel): Array[Double] =
    Array.tabulate(model.k) { j =>
      var acc = 0d
      var i = 0
      while (i < model.dim) {
        acc += (vec(i).toDouble - model.mean(i)) * model.components(j)(i)
        i += 1
      }
      acc
    }

  /** Materialize projections next to the original vectors (the
    * [[Ann.rpEncode]] analog — at scale, project once at build time and
    * store; queries then scan k doubles per row). */
  def pcaEncode(data: DataFrame, featureCol: String, model: PcaModel): DataFrame =
    data.withColumn(PcaCol, project(col(featureCol), model))

  /** PCA-shortlist kNN over a pre-encoded table: top-(k·refine) by
    * projected L2 (for an orthonormal basis the projected distance
    * LOWER-BOUNDS the ambient distance, so the shortlist is the same
    * contraction argument as [[Ann.rpSearchEncoded]] with learned,
    * variance-optimal axes), then exact rerank on the original
    * vectors. */
  def pcaSearchEncoded(encoded: DataFrame, query: Seq[Float],
      model: PcaModel, cfg: SearchConfig, refine: Int = 10): DataFrame = {
    require(refine >= 1, s"refine=$refine")
    require(!cfg.higherIsBetter,
      "pcaSearchEncoded shortlists by projected L2 distance — configure a " +
        "distance (lower-is-better) score function")
    require(encoded.columns.contains(PcaCol),
      s"pcaSearchEncoded needs the $PcaCol column — encode with pcaEncode first")
    val qp = projectLocal(query, model)
    val dist2 = (1 to model.k).map { j =>
      val diff = element_at(col(PcaCol), j) - lit(qp(j - 1)); diff * diff
    }.reduce(_ + _)
    val tie = cfg.tieBreakCol.map(c => col(c).asc).toSeq
    val shortlist = encoded
      .filter(Search.passesFilters(cfg))
      .withColumn("__pcd", dist2)
      .orderBy(col("__pcd").asc +: tie: _*)
      .limit(cfg.limit * refine)
      .drop(PcaCol, "__pcd")
    Search.search(shortlist, query, cfg)
  }

  /** Persist a fitted model as one atomically-swapped sidecar (the model
    * is a k·d driver artifact). Layout: a version header, then
    * `mean\t...`, `eig\t...`, `tvar\t...`, and one `comp\t<j>\t...` line
    * per component; doubles round-trip exactly via
    * `toString`/`toDouble`. */
  def pcaSave(spark: SparkSession, dir: String, model: PcaModel): Unit = {
    val lines = Seq(s"pca_v1\t${model.dim}\t${model.k}") ++
      Seq("mean\t" + model.mean.mkString(",")) ++
      Seq("eig\t" + model.eigenvalues.mkString(",")) ++
      Seq("tvar\t" + model.totalVariance) ++
      model.components.zipWithIndex.map { case (c, j) =>
        s"comp\t$j\t" + c.mkString(",") }
    graft.model.VersionedDir.writeSidecar(spark, dir, "pca_model.tsv", lines)
  }

  /** Load a persisted model ([[pcaSave]]). */
  def pcaLoad(spark: SparkSession, dir: String): PcaModel = {
    val lines = graft.model.VersionedDir.readSidecar(spark, dir, "pca_model.tsv")
    val h = lines.head.split("\t")
    require(h(0) == "pca_v1", s"unknown pca_model.tsv version tag '${h(0)}'")
    val kk = h(2).toInt
    val fields = lines.tail.map { ln =>
      val p = ln.split("\t"); (p(0), p) }.toMap
    val comps = Array.ofDim[Array[Double]](kk)
    lines.tail.foreach { ln =>
      val p = ln.split("\t")
      if (p(0) == "comp") comps(p(1).toInt) = p(2).split(",").map(_.toDouble)
    }
    PcaModel(
      fields("mean")(1).split(",").map(_.toDouble),
      comps,
      fields("eig")(1).split(",").map(_.toDouble),
      fields("tvar")(1).toDouble)
  }
}
