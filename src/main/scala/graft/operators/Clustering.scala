package graft.operators

import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.functions.{NearestCentroid, ScoreFunctions}

/** Embedding clustering for training-data curation: exact Lloyd k-means
  * iterations over a `array<float>` embedding column, plus SemDeDup-style
  * semantic deduplication (cluster the corpus, then drop near-duplicate
  * members within each cluster — Abbas et al. 2023, "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication").
  *
  * This is deliberately NOT `org.apache.spark.ml.clustering.KMeans` (which
  * backs the IVF coarse quantizer, [[Ann.ivfBuild]]): curation needs
  * oracle-checkable arithmetic — deterministic seeding from a grouping
  * column, exact elementwise-mean centroids, a pinned tie-break — so the
  * assignment can be replayed query-for-query by an independent engine.
  * The physical shape is the textbook distributed Lloyd:
  *
  *  - ASSIGN is map-only: centroids broadcast as expression literals, one
  *    codegen'd kernel call per row ([[graft.functions.NearestCentroid]],
  *    O(k·d) primitive flops, no shuffle);
  *  - RECOMPUTE is ONE partial-aggregate shuffle (`Summarizer.mean`
  *    map-side combines per partition; k result rows cross the wire);
  *  - k is bounded by [[MaxCentroids]] — the centroid set must stay
  *    broadcast-sized, which is also what keeps ASSIGN map-only. At 100 TB
  *    with a huge k, fit on a sample (the [[Ann.ivfBuild]] `fitFraction`
  *    pattern) and run the single assignment pass over everything.
  *
  * Iteration scans the source once per pass (an assignment is a cheap
  * codegen map over the scan); callers looping many iterations over an
  * expensive upstream plan should `localCheckpoint` the input — the
  * operators do not persist behind the caller's back.
  */
object Clustering {

  /** Broadcast-size contract for the centroid set: assignment inlines the
    * matrix into the expression, so k·d doubles ride in the serialized
    * plan. 2^16 × d=1024 ≈ 0.5 GiB is already generous; beyond that a
    * flat Lloyd is the wrong algorithm (use a hierarchical/IVF layout). */
  val MaxCentroids: Int = 1 << 16

  /** A cluster id + its exact mean vector. */
  final case class Centroid(id: Int, v: Array[Double])

  /** Exact elementwise mean per `groupCol` value — centroid
    * initialization (seed clusters from a label/source/topic column) and
    * the RECOMPUTE step of [[lloyd]]. One partial-aggregate shuffle; k
    * rows collect to the driver (bounded by [[MaxCentroids]]). Groups
    * with a NULL id are dropped — a null cluster never becomes a
    * centroid. Returned sorted by id: [[assign]]'s tie-break contract
    * (first wins on exact distance ties = lowest cluster id). */
  def groupCentroids(df: DataFrame, groupCol: String, featureCol: String): Array[Centroid] = {
    val rows = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("int").as("__g"))
      .agg(vector_to_array(Summarizer.mean(
        array_to_vector(col(featureCol).cast("array<double>")))).as("__c"))
      .collect()
    require(rows.length <= MaxCentroids,
      s"${rows.length} centroids exceed MaxCentroids=$MaxCentroids — the " +
        "centroid set must stay broadcast-sized; use a sampled/hierarchical fit")
    rows.map(r => Centroid(r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_.id)
  }

  /** `struct(cluster, dist)` of the nearest centroid for `vec` — a single
    * codegen'd kernel call per row (see [[graft.functions.NearestCentroid]]). */
  def nearestCentroid(centroids: Array[Centroid], vec: Column): Column = {
    require(centroids.nonEmpty, "nearestCentroid: empty centroid set")
    val d = centroids.head.v.length
    require(centroids.forall(_.v.length == d),
      "nearestCentroid: centroids disagree on dimension")
    val sorted = centroids.sortBy(_.id)
    Bridge.column(NearestCentroid(
      Bridge.expression(vec.cast("array<double>")),
      sorted.map(_.id), sorted.flatMap(_.v), d))
  }

  /** ASSIGN: adds `cluster` (nearest centroid id) and `dist` (euclidean
    * distance to it) to every row. Map-only; no shuffle. */
  def assign(df: DataFrame, centroids: Array[Centroid], featureCol: String,
      clusterCol: String = "cluster", distCol: String = "dist"): DataFrame = {
    require(Seq(clusterCol, distCol, "__nc").forall(!df.columns.contains(_)),
      s"assign reserves columns $clusterCol, $distCol, __nc")
    df.withColumn("__nc", nearestCentroid(centroids, col(featureCol)))
      .withColumn(clusterCol, col("__nc.cluster"))
      .withColumn(distCol, col("__nc.dist"))
      .drop("__nc")
  }

  /** A finished Lloyd run: the final assignment (with `cluster`/`dist`)
    * and the centroids that produced it. */
  final case class LloydResult(assigned: DataFrame, centroids: Array[Centroid])

  /** `iters` Lloyd passes from explicit seed centroids: assign, then
    * (between passes) recompute each surviving cluster's exact mean. A
    * cluster that loses every member simply drops out — k may shrink
    * across iterations (the empty-cluster semantic; re-seeding splits is
    * a policy choice left to callers, and the oracle replays the drop). */
  def lloyd(df: DataFrame, init: Array[Centroid], featureCol: String,
      iters: Int): LloydResult = {
    require(iters >= 1, s"iters=$iters")
    var cents = init
    var assigned = assign(df, cents, featureCol)
    var i = 1
    while (i < iters) {
      cents = groupCentroids(assigned.drop("dist"), "cluster", featureCol)
      assigned = assign(df, cents, featureCol)
      i += 1
    }
    LloydResult(assigned, cents)
  }

  /** [[lloyd]] seeded from a grouping column's exact means (label, source,
    * topic, …) — fully deterministic end-to-end: both the seed and every
    * subsequent step derive from the data. */
  def lloydByGroup(df: DataFrame, groupCol: String, featureCol: String,
      iters: Int): LloydResult =
    lloyd(df, groupCentroids(df, groupCol, featureCol), featureCol, iters)

  /** SemDeDup: route every row to its nearest centroid, then within each
    * cluster drop any row that has a same-cluster neighbour with a
    * SMALLER id and cosine similarity ≥ `threshold` (greedy leader dedup
    * in id order — deterministic, and exactly replayable in SQL; the
    * published method's "keep one per ε-ball" with a pinned
    * representative choice). Survivors keep their `cluster` column.
    *
    * Scale shape: the candidate join is an equi-join ON CLUSTER — the
    * whole point of SemDeDup is that k is sized so clusters are small
    * (n/k rows each), making the within-cluster quadratic affordable and
    * embarrassingly parallel. That contract is ENFORCED, not assumed:
    * the largest cluster is measured first (one cheap count aggregate —
    * the assignment recompute is a codegen map over the scan) and an
    * oversized cluster fails loudly naming the fix (raise k), before the
    * quadratic join can run away. */
  def semDedup(df: DataFrame, centroids: Array[Centroid], idCol: String,
      featureCol: String, threshold: Double,
      maxClusterRows: Long = 200000L): DataFrame = {
    val a = assign(df, centroids, featureCol).drop("dist")
    val top = a.groupBy("cluster").agg(count(lit(1)).as("__n"))
      .orderBy(desc("__n")).limit(1).collect()
    top.headOption.foreach { r =>
      require(r.getLong(1) <= maxClusterRows,
        s"semDedup: cluster ${r.getInt(0)} has ${r.getLong(1)} rows > " +
          s"maxClusterRows=$maxClusterRows — the within-cluster pairwise pass " +
          "would blow up; raise k (more, smaller clusters) or the cap")
    }
    val l = a.select(col("cluster"), col(idCol).as("__l_id"), col(featureCol).as("__l_v"))
    val r = a.select(col("cluster"), col(idCol).as("__r_id"), col(featureCol).as("__r_v"))
    val dups = l.join(r, Seq("cluster"))
      .filter(col("__r_id") < col("__l_id"))
      .filter(ScoreFunctions.cosineSimilarity(col("__l_v"), col("__r_v")) >= threshold)
      .select(col("__l_id").as(idCol)).distinct()
    a.join(dups, Seq(idCol), "left_anti")
  }
}
