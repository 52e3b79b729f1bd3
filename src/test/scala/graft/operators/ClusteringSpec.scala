package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Lloyd k-means + SemDeDup semantics ([[Clustering]]): exact centroid
  * arithmetic, assignment tie-break, SSE monotonicity, empty-cluster drop,
  * partitioning invariance, and the leader-dedup contract. */
class ClusteringSpec extends SparkTestBase {

  import spark.implicits._

  // Two tight groups around (0,0) and (10,10), plus one point mislabeled
  // into the wrong group so Lloyd has real work to do.
  private def pts = Seq(
    (1L, Seq(0f, 0f), 0), (2L, Seq(1f, 0f), 0), (3L, Seq(0f, 1f), 0),
    (4L, Seq(10f, 10f), 1), (5L, Seq(11f, 10f), 1), (6L, Seq(10f, 11f), 1),
    (7L, Seq(0.5f, 0.5f), 1) // mislabeled: near group 0
  ).toDF("id", "embedding", "label")

  test("groupCentroids: exact per-label means, sorted by id") {
    val c = Clustering.groupCentroids(pts, "label", "embedding")
    assert(c.map(_.id).toSeq == Seq(0, 1))
    assert(c(0).v.toSeq == Seq(1.0 / 3, 1.0 / 3))
    assert(c(1).v.toSeq == Seq(31.5 / 4, 31.5 / 4))
  }

  test("assign: nearest centroid, euclidean dist, mislabeled point moves") {
    val c = Clustering.groupCentroids(pts, "label", "embedding")
    val a = Clustering.assign(pts, c, "embedding")
      .select("id", "cluster", "dist").as[(Long, Int, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(a(7L)._1 == 0) // reassigned to the near group
    assert(Seq(1L, 2L, 3L).forall(a(_)._1 == 0))
    assert(Seq(4L, 5L, 6L).forall(a(_)._1 == 1))
    val expected = math.sqrt(2 * math.pow(0.5 - 1.0 / 3, 2))
    assert(math.abs(a(7L)._2 - expected) < 1e-12)
  }

  test("assign: exact distance tie breaks to the lowest cluster id") {
    val two = Seq((1L, Seq(5f, 5f))).toDF("id", "embedding")
    val cents = Array(
      Clustering.Centroid(3, Array(0.0, 0.0)),
      Clustering.Centroid(7, Array(10.0, 10.0)))
    val a = Clustering.assign(two, cents, "embedding")
      .select("cluster").as[Int].head()
    assert(a == 3)
  }

  test("lloyd: within-cluster SSE is non-increasing across passes") {
    def sse(iters: Int): Double =
      Clustering.lloydByGroup(pts, "label", "embedding", iters).assigned
        .agg(sum(col("dist") * col("dist"))).head().getDouble(0)
    val s = (1 to 4).map(sse)
    assert(s.zip(s.tail).forall { case (a, b) => b <= a + 1e-12 },
      s"SSE increased across Lloyd passes: $s")
  }

  test("lloyd: a cluster that loses all members drops out (k shrinks)") {
    // seed: one centroid owns everything, the other sits far away
    val cents = Array(
      Clustering.Centroid(0, Array(5.0, 5.0)),
      Clustering.Centroid(1, Array(1e6, 1e6)))
    val r = Clustering.lloyd(pts, cents, "embedding", iters = 2)
    assert(r.centroids.map(_.id).toSeq == Seq(0))
    assert(r.assigned.select("cluster").distinct().as[Int].collect().toSeq == Seq(0))
  }

  test("assignment is invariant under repartitioning") {
    val c = Clustering.groupCentroids(pts, "label", "embedding")
    val a1 = Clustering.assign(pts, c, "embedding")
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    val a2 = Clustering.assign(pts.repartition(7), c, "embedding")
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    assert(a1 == a2)
  }

  test("nearestCentroid rejects dimension mismatch loudly") {
    val bad = Seq((1L, Seq(1f, 2f, 3f))).toDF("id", "embedding")
    val cents = Array(Clustering.Centroid(0, Array(0.0, 0.0)))
    val ex = intercept[Exception] {
      Clustering.assign(bad, cents, "embedding").collect()
    }
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("nearest_centroid")), msgs.mkString(" | "))
  }

  test("semDedup: drops same-cluster near-dups with larger ids, keeps leaders") {
    // 8 is an exact copy of 1 (cosine 1), 9 is a scaled copy of 4
    // (cosine exactly 1 — scale-invariance), 10 is its own direction.
    val withDups = pts.unionByName(Seq(
      (8L, Seq(0f, 0f), 0), (9L, Seq(20f, 20f), 1), (10L, Seq(-5f, 5f), 0))
      .toDF("id", "embedding", "label"))
    // cosine is undefined on the zero vector (engine guards to 0) — use
    // non-zero copies only: replace id 1/8's zero vector
    val nz = withDups.withColumn("embedding",
      when(col("id").isin(1L, 8L), array(lit(2f), lit(0f))).otherwise(col("embedding")))
    val c = Clustering.groupCentroids(nz, "label", "embedding")
    val out = Clustering.semDedup(nz, c, "id", "embedding", threshold = 0.95)
      .select("id").as[Long].collect().toSet
    assert(!out.contains(8L), "exact copy with larger id must drop")
    assert(!out.contains(9L), "scaled copy (cosine 1) must drop")
    assert(out.contains(1L) && out.contains(4L), "leaders survive")
    assert(out.contains(10L), "distinct direction survives")
  }

  test("semDedup: oversized cluster fails loudly naming the fix") {
    val c = Array(Clustering.Centroid(0, Array(0.0, 0.0)))
    val ex = intercept[IllegalArgumentException] {
      Clustering.semDedup(pts, c, "id", "embedding", 0.9, maxClusterRows = 3L)
    }
    assert(ex.getMessage.contains("raise k"))
  }
}
