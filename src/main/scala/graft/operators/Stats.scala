package graft.operators

import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's dataset-statistics pipeline (SURVEY.md §2.6 G1-G4):
  * `DataInfo{n, avg, maxDistance, hist}` computed by `Data.Process`
  * (reference data/newsync.go:93-227).
  *
  * The reference computes these *approximately* in one streaming pass —
  * the mean uses the previous run's N as divisor and distances are taken
  * against the previous centroid (newsync.go:142-157). We compute the exact
  * versions in three scans (count+mean, max-distance, histogram); each scan
  * is a single partial-aggregate per partition + tiny final merge, so at
  * cluster scale the cost is 3 table reads with no shuffle of row data —
  * cache the (projected, casted) feature column once if the table is hot.
  *
  * All arithmetic is double; results are rounded to 6 decimals so the
  * histogram bucketing (`floor(dist/maxDist*bins)`) is computed from
  * identical IEEE doubles on any engine that replays it (the DuckDB oracle
  * does exactly this).
  */
object Stats {

  val Bins = 64 // reference histogram size, newsync.go:141-167

  /** Centroid distance — the SAME L2 the engine scores with
    * (ScoreFunctions.hofL2: null pairs contribute 0 = truncate-to-min
    * semantics), not a private re-spelling: a re-embedded dataset whose
    * dimension changed mid-maintenance must lag gracefully against the
    * old centroid, not NULL every distance and NPE the driver read. */
  private def dist2(a: Column, b: Column): Column =
    graft.functions.ScoreFunctions.hofL2(a, b)

  /** Rows that can contribute to vector stats. The reference's rows always
    * carry a vector (protobuf repeated float); a Spark table can hold null
    * features, which would null the distance aggregates (NPE on read) and
    * silently under-weight the histogram — stats are defined over rows
    * WITH well-defined vectors, documented here once for all G1-G4. A NaN
    * element would poison everything downstream (max of NaN is NaN, every
    * bucket floor(dist/NaN·bins) collapses to 0, the mean carries NaN) —
    * same rationale as Search's NaN score guard. */
  private def withVectors(df: DataFrame, featureCol: String): DataFrame =
    df.filter(col(featureCol).isNotNull &&
      !exists(col(featureCol), x => isnan(x.cast("double"))))

  /** G1+G2: (n, exact mean vector) in one aggregate scan (count and
    * Summarizer.mean — a TypedImperativeAggregate, map-side partial sums,
    * no row shuffle — share the pass). The cheap `isEmpty` probe guards
    * Summarizer.mean, which throws on empty input, without paying a full
    * count scan first. */
  def countAndMean(df: DataFrame, featureCol: String): (Long, Seq[Double]) = {
    val src = withVectors(df, featureCol)
    if (src.isEmpty) return (0L, Nil)
    val row = src.agg(
      count(lit(1)).as("n"),
      vector_to_array(Summarizer.mean(
        array_to_vector(col(featureCol).cast("array<double>")))).as("avg"))
      .head()
    (row.getLong(0), row.getSeq[Double](1))
  }

  /** G1-G4 as a one-row DataFrame: n, avg, max_distance, hist.
    * hist(b) = share of rows whose centroid-distance falls in bucket b of
    * [0, maxDistance] split into `bins`; weights 1/N sum to 1
    * (newsync.go:141-167, clamped to the last bucket). */
  def dataInfo(df: DataFrame, featureCol: String, bins: Int = Bins): DataFrame = {
    val (n, mean) = countAndMean(df, featureCol)
    if (n == 0) {
      // empty dataset: the maintenance loop must not crash (fresh Data in
      // the reference reports zeroed stats)
      import df.sparkSession.implicits._
      return Seq((0L, Seq.empty[Double], 0d, Seq.fill(bins)(0d)))
        .toDF("n", "avg", "max_distance", "hist")
    }
    val feat = col(featureCol).cast("array<double>")
    val ctr = lit(mean.toArray)

    // pass 2: exact max distance to the (current, exact) centroid
    val distCol = round(dist2(feat, ctr), 6).as("dist")
    val dists = withVectors(df, featureCol).select(distCol)
    val maxDist = dists.agg(round(max(col("dist")), 6)).head().getDouble(0)

    // pass 3: dense 64-bin histogram as one partial-aggregate
    val bucket =
      if (maxDist == 0d) lit(0)
      else least(floor(col("dist") / lit(maxDist) * bins), lit(bins - 1)).cast("int")
    val histSums = (0 until bins).map(i =>
      round(sum(when(bucket === i, 1d).otherwise(0d)) / n, 6))
    dists
      .agg(array(histSums: _*).as("hist"))
      .select(
        lit(n).as("n"),
        transform(ctr, x => round(x, 6)).as("avg"),
        lit(maxDist).as("max_distance"),
        col("hist"))
  }

  /** Per-group vocabulary (distinct tokens) + token totals — the
    * corpus-mix stat a training pipeline tracks per source/language.
    * Exact mode runs Spark's two-phase distinct; `approx = true` swaps in
    * `approx_count_distinct` (HyperLogLog++, `rsd` relative error) with
    * the IDENTICAL plan shape (explode → partial agg) but a sketch-sized
    * shuffle — the 100-TB spelling, where a billion-token vocabulary must
    * never materialize per-token distinct state. Exact mode backs the
    * `text_vocab` oracle; the sketch is spec-bounded against it. */
  def vocabulary(df: DataFrame, groupCol: String, textCol: String,
      approx: Boolean = false, rsd: Double = 0.05): DataFrame = {
    val toks = df.select(col(groupCol),
      explode(graft.functions.TextAnalysis.tokens(col(textCol))).as("tok"))
    val vocabAgg =
      if (approx) approx_count_distinct(col("tok"), rsd)
      else countDistinct(col("tok"))
    toks.groupBy(groupCol)
      .agg(vocabAgg.as("vocab"), count(lit(1)).as("total_tokens"))
  }

  /** The reference's one-pass Process shape (newsync.go:142-167):
    * distances and histogram buckets are taken against the PREVIOUS run's
    * centroid and max-distance — the streaming approximation that
    * converges under repeated runs. The MEAN here is exact (current-N
    * divisor via Summarizer); the reference also divides by a lagged N,
    * a second-order wobble this implementation deliberately skips — only
    * the distance/bucket lag is reference-parity. ONE table scan (count +
    * mean + max + 64 bucket sums in a single partial aggregate) — the
    * scale-friendly maintenance-loop variant; [[dataInfo]] is the exact
    * 3-scan version. */
  def dataInfoLagged(df: DataFrame, featureCol: String,
      prev: graft.model.DataInfo, bins: Int = Bins): graft.model.DataInfo = {
    val src = withVectors(df, featureCol)
    if (src.isEmpty) // fresh/empty Data reports zeroed stats, never crashes
      return graft.model.DataInfo(0L, Seq.empty, 0d, Seq.fill(bins)(0d))
    val feat = col(featureCol).cast("array<double>")
    val prevCtr =
      if (prev.avg.nonEmpty) lit(prev.avg.toArray)
      else transform(feat, _ => lit(0d)) // first run: zero centroid like a fresh Data
    // rounded to 6 BEFORE max/bucketing — same replay contract as dataInfo
    val dist = round(dist2(feat, prevCtr), 6)
    val bucket =
      if (prev.maxDistance <= 0d) lit(0)
      else least(floor(dist / prev.maxDistance * bins), lit(bins - 1)).cast("int")
    val histSums = (0 until bins).map(i => sum(when(bucket === i, 1d).otherwise(0d)))
    val meanAgg = vector_to_array(Summarizer.mean(array_to_vector(feat)))
    val row = src.agg(
      count(lit(1)).as("n"), meanAgg.as("avg"), max(dist).as("md"),
      array(histSums: _*).as("hist")).head()
    val n = row.getLong(0)
    graft.model.DataInfo(
      n,
      row.getSeq[Double](1),
      row.getDouble(2),
      row.getSeq[Double](3).map(_ / math.max(n, 1)))
  }
}
