package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** One-off calibration probe (kept as evidence, not a floor assert):
  * prints mean recall@10 of the PCA shortlist vs the exact scan on the
  * synthetic near-uniform embeddings — the numbers the `ann_pca_knn`
  * recall floor is derived from (floor = measured − margin). The corpus
  * is structure-free (no spectrum decay), the WORST case for PCA: recall
  * here is the shortlist fraction baseline, so the floor must be taken
  * at the LARGEST sf the driver benches (sf0.1, 2000 rows). */
class PcaRecallProbe extends SparkTestBase {

  test("probe: PCA shortlist recall across sf and (k, refine)") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").foreach { dir =>
      val emb = graft.queries.Tables(spark, dir, "embeddings")
      val cfg = SearchConfig(
        scoreFuncName = "VectorDistance", higherIsBetter = false, limit = 10,
        featureCol = "embedding", keyCols = Seq("vec_id"),
        tieBreakCol = Some("vec_id"), assumeUniqueKeys = true)
      val qs = emb.filter(col("vec_id") < 20)
        .select("vec_id", "embedding")
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
      val exactSets = qs.map { case (qid, qv) =>
        qid -> Search.search(emb, qv, cfg)
          .select("vec_id").collect().map(_.getLong(0)).toSet
      }.toMap
      for (k <- Seq(8, 16, 32)) {
        val m = Pca.fit(emb, "embedding", k = k)
        val enc = Pca.pcaEncode(emb, "embedding", m).localCheckpoint(true)
        for (refine <- Seq(16, 32)) {
          val recalls = qs.map { case (qid, qv) =>
            val approx = Pca.pcaSearchEncoded(enc, qv, m, cfg, refine = refine)
              .select("vec_id").collect().map(_.getLong(0)).toSet
            (approx intersect exactSets(qid)).size.toDouble / exactSets(qid).size
          }
          info(f"[probe] $dir k=$k refine=$refine: recall@10 " +
            f"mean=${recalls.sum / recalls.length}%.3f " +
            f"min=${recalls.min}%.2f q0=${recalls.head}%.2f")
        }
      }
    }
  }
}
