package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Lifecycle of the semantic admission gate
  * ([[Clustering.admitSemantic]]) against PERSISTED cluster state
  * ([[Clustering.clusterSave]]/[[clusterLoad]]): three sequential
  * micro-batches admit against the loaded state, survivors append, state
  * re-persists under the versioned swap — the composition a streaming
  * curation pipeline runs per trigger. */
class SemanticGateSpec extends SparkTestBase {

  import spark.implicits._

  private def vec(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)

  test("persisted state round-trips bit-identical centroids and rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cluster-state").toString
    val base = Seq((1L, vec(1, 0), 0), (2L, vec(0, 1), 1), (3L, vec(0.9, 0.1), 0))
      .toDF("id", "embedding", "label")
    val cents = Clustering.groupCentroids(base, "label", "embedding")
    val assigned = Clustering.assign(base, cents, "embedding").drop("dist")
    Clustering.clusterSave(dir, assigned, cents)
    val (loaded, loadedCents) = Clustering.clusterLoad(spark, dir)
    assert(loadedCents.map(_.id).toSeq == cents.map(_.id).toSeq)
    assert(loadedCents.zip(cents).forall { case (a, b) => a.v.sameElements(b.v) },
      "Double.toString round-trip must be bit-identical")
    assert(loaded.select("id", "cluster").as[(Long, Int)].collect().toSet ==
      assigned.select("id", "cluster").as[(Long, Int)].collect().toSet)
  }

  test("three admission rounds against growing persisted state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sem-gate").toString
    // seed corpus: two well-separated directions
    val seed = Seq((1L, vec(1, 0), 0), (2L, vec(0, 1), 1))
      .toDF("id", "embedding", "label")
    val cents = Clustering.groupCentroids(seed, "label", "embedding")
    Clustering.clusterSave(dir, Clustering.assign(seed, cents, "embedding").drop("dist"), cents)

    def round(batch: org.apache.spark.sql.DataFrame): Set[Long] = {
      val (corpus, cs) = Clustering.clusterLoad(spark, dir)
      val admitted = Clustering.admitSemantic(batch, corpus, cs, "id", "embedding", 0.95)
      val ids = admitted.select("id").as[Long].collect().toSet
      Clustering.clusterSave(dir, corpus.unionByName(admitted), cs)
      ids
    }

    // round 1: a scaled copy of corpus id 1 (cosine 1 → reject), one novel
    // direction (admit), and an in-batch pair of near-identical rows
    // (leader 20 admits, 21 drops)
    val r1 = round(Seq((10L, vec(2, 0), 0), (11L, vec(0.7, 0.7), 0),
      (20L, vec(-1, 0.05), 0), (21L, vec(-1, 0.050001), 0))
      .toDF("id", "embedding", "label"))
    assert(r1 == Set(11L, 20L), s"round 1 admitted $r1")

    // round 2: a copy of round-1 ADMITTED id 11 must now reject (state
    // grew); a replay of id 20 drops idempotently; one novel admits
    val r2 = round(Seq((30L, vec(1.4, 1.4), 0), (20L, vec(-1, 0.05), 0),
      (31L, vec(0.1, -1), 1)).toDF("id", "embedding", "label"))
    assert(r2 == Set(31L), s"round 2 admitted $r2")

    // round 3: everything near an accumulated member rejects
    val r3 = round(Seq((40L, vec(0.2, -2), 1), (41L, vec(-2, 0.1), 0))
      .toDF("id", "embedding", "label"))
    assert(r3 == Set.empty[Long], s"round 3 admitted $r3")

    val (finalState, _) = Clustering.clusterLoad(spark, dir)
    assert(finalState.select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 11L, 20L, 31L))
  }
}
