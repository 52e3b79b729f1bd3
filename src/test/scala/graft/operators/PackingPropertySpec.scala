package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** ScalaCheck properties for sequence packing over generated corpora
  * (seeded — reproducible): chunked tiles each shard's token stream
  * exactly, ffd never overflows and assigns every doc exactly once. */
class PackingPropertySpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ids unique by construction; token counts include 0 and seqLen edges
  private val corpusGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(1, 300)
    nts <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.chooseNum(1L, 200L), 1 -> Gen.const(0L), 1 -> Gen.const(256L)))
  } yield nts.zipWithIndex.map { case (nt, i) => (i.toLong, nt) }

  test("chunked tiles each shard's token stream with no gaps or overlaps") {
    val seqLen = 256
    for (seed <- Seq(1L, 7L, 99L)) {
      val corpus = sample(corpusGen, seed)
      val byId = corpus.toMap
      val out = Packing.chunked(corpus.toDF("id", "nt"), "id", "nt", seqLen, shards = 3)
        .select("id", "shard", "seq_start", "seq_end", "offset")
        .as[(Long, Long, Long, Long, Long)].collect()
      assert(out.length == corpus.size)
      out.groupBy(_._2).foreach { case (_, rows) =>
        // reconstruct the stream: order docs by absolute position and
        // check each starts exactly where the previous ended
        val ordered = rows.sortBy(r => r._3 * seqLen + r._5) // seq_start·L + offset
        var cursor = 0L
        ordered.foreach { case (id, _, st, en, off) =>
          assert(st * seqLen + off == cursor, s"gap/overlap at doc $id (seed $seed)")
          val nt = byId(id)
          assert(en == math.max((cursor + nt - 1) / seqLen, st), s"seq_end of doc $id")
          cursor += nt
        }
      }
    }
  }

  test("ffd: every doc once, no bin overflow, bins stay in their shard") {
    val seqLen = 256
    for (seed <- Seq(3L, 11L)) {
      val corpus = sample(corpusGen, seed)
      val rows = Packing.ffd(corpus.toDF("id", "nt"), "id", "nt", seqLen, shards = 3)
        .as[(Int, Long, Long, Long)].collect()
      assert(rows.map(_._3).sorted.toSeq == corpus.map(_._1).sorted, s"seed $seed")
      rows.groupBy(_._2).foreach { case (bin, rs) =>
        assert(rs.map(_._4).sum <= seqLen, s"bin $bin overflows (seed $seed)")
        assert(rs.map(_._1).distinct.size == 1, s"bin $bin crosses shards")
        assert((bin >> 40) == rs.head._1, s"bin $bin namespace")
      }
    }
  }
}
