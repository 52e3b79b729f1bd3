package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** ScalaCheck properties for [[Dedup.resolve]] over generated random pair
  * graphs (seeded — reproducible), checked against an in-memory reference
  * union-find. Exercises BOTH physical strategies: the driver union-find
  * under the size gate and the distributed min-label propagation past it
  * (forced via maxDriverEdges = -1), which must agree with each other and
  * with the reference on every graph. */
class ResolvePropertySpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // random graphs: node universe up to 120 ids (sparse and dense mixes,
  // self-contained chains, isolated nodes), edges may repeat and may
  // reference ids OUTSIDE the purge universe (a real partial-purge shape)
  private val graphGen: Gen[(Seq[(Long, Long)], Seq[Long])] = for {
    nNodes <- Gen.choose(2, 120)
    nEdges <- Gen.choose(0, 200)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, nNodes - 1L)
      b0 <- Gen.choose(0L, nNodes - 2L)
      b = if (b0 >= a) b0 + 1 else b0 // != a without a filtering retry
    } yield (math.min(a, b), math.max(a, b)))
    // ids = a SUBSET of the universe: resolve must still keep exactly one
    // survivor per component intersected with ids
    ids <- Gen.someOf(0L until nNodes.toLong)
  } yield (edges, ids.toSeq)

  /** Reference: plain union-find over the edge list. */
  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  test("resolve == reference union-find on random graphs, both strategies") {
    for (seed <- Seq(2L, 13L, 42L, 77L, 1234L)) {
      val (edges, idSeq) = sample(graphGen, seed)
      val ids = idSeq.toSet
      if (ids.nonEmpty) {
        val comp = components(edges)
        // expected keep-list semantics (DedupSpec pins these on small
        // fixtures; here they must hold on arbitrary graphs):
        //  - canonical = the component representative as resolve anchors it
        //    (min over the component's members RESTRICTED to ids if any of
        //    the component is in ids — re-anchoring keeps the purge list
        //    consumable when the global min was already purged)
        //  - isolated ids (no edges) keep themselves
        val byComp = comp.groupBy(_._2).map { case (c, m) => c -> m.keySet }
        val expected: Map[Long, (Long, Boolean)] = ids.iterator.map { id =>
          comp.get(id) match {
            case None => id -> ((id, true))
            case Some(c) =>
              val inIds = byComp(c).intersect(ids)
              val anchor = inIds.min
              id -> ((anchor, id == anchor))
          }
        }.toMap
        val pairsDf = edges.toDF("id_a", "id_b")
        val idsDf = idSeq.toDF("doc_id")
        for (maxDriverEdges <- Seq(2000000L, -1L)) {
          val got = Dedup.resolve(pairsDf, idsDf, "doc_id",
              maxDriverEdges = maxDriverEdges)
            .select("doc_id", "canonical", "keep")
            .as[(Long, Long, Boolean)].collect()
            .map(r => r._1 -> ((r._2, r._3))).toMap
          // one row per id, and each component keeps exactly one survivor
          assert(got.keySet == ids, s"seed $seed gate $maxDriverEdges")
          assert(got == expected,
            s"seed $seed gate $maxDriverEdges: ${got.toSeq.diff(expected.toSeq).take(5)}")
        }
      }
    }
  }
}
