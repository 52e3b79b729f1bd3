package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Sequence packing: chunked layout arithmetic and FFD invariants. */
class PackingSpec extends SparkTestBase {

  import spark.implicits._

  private def hash(id: Long): Long =
    (Mixture.HashA * id + Mixture.HashB) % Mixture.HashP

  private def docs = (0L until 60L).map(i => (i, 1L + (i * 37) % 200)).toDF("id", "nt")

  test("chunked: layout equals the replayed running-sum arithmetic") {
    val seqLen = 128
    val out = Packing.chunked(docs, "id", "nt", seqLen, shards = 4)
      .select("id", "shard", "seq_start", "seq_end", "offset")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // replay in plain Scala: hash-shard, order by (hash, id), running sum
    val rows = (0L until 60L).map(i => (i, 1L + (i * 37) % 200))
    rows.groupBy { case (id, _) => hash(id) % 4 }.foreach { case (shard, ds) =>
      var before = 0L
      ds.sortBy { case (id, _) => (hash(id), id) }.foreach { case (id, nt) =>
        val (_, s, st, en, off) = out(id)
        assert(s == shard, s"doc $id shard")
        assert(st == before / seqLen, s"doc $id seq_start")
        assert(en == math.max((before + nt - 1) / seqLen, before / seqLen), s"doc $id seq_end")
        assert(off == before % seqLen, s"doc $id offset")
        before += nt
      }
    }
    assert(out.size == 60)
  }

  test("chunked: zero-length doc pins to its start sequence") {
    val d = Seq((1L, 0L), (2L, 5L), (3L, 0L)).toDF("id", "nt")
    val r = Packing.chunked(d, "id", "nt", 4, shards = 1)
      .select("seq_start", "seq_end").as[(Long, Long)].collect()
    r.foreach { case (st, en) => assert(en >= st) }
  }

  test("ffd: exact assignment, capacity, shard namespacing, determinism") {
    val seqLen = 256
    val out = Packing.ffd(docs, "id", "nt", seqLen, shards = 4)
    val rows = out.as[(Int, Long, Long, Long)].collect()
    assert(rows.map(_._3).toSet == (0L until 60L).toSet) // every doc exactly once
    assert(rows.length == 60)
    // capacity: no bin overflows
    val perBin = rows.groupBy(_._2).view.mapValues(_.map(_._4).sum)
    perBin.foreach { case (bin, t) => assert(t <= seqLen, s"bin $bin holds $t") }
    // bin ids are namespaced by shard
    rows.foreach { case (shard, bin, _, _) => assert((bin >> 40) == shard) }
    // FFD quality: bins <= 11/9 opt + 1 per shard (opt >= ceil(tokens/seqLen))
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      val bins = rs.map(_._2).distinct.size
      val opt = (rs.map(_._4).sum + seqLen - 1) / seqLen
      assert(bins <= (11 * opt) / 9 + 1, s"shard $shard: $bins bins vs opt $opt")
    }
    // deterministic layout
    val again = Packing.ffd(docs, "id", "nt", seqLen, shards = 4)
      .as[(Int, Long, Long, Long)].collect()
    assert(again.sortBy(_._3).toSeq == rows.sortBy(_._3).toSeq)
  }

  test("scale contract: chunked plan windows per shard — one shuffle, no global sort") {
    val out = Packing.chunked(docs, "id", "nt", 128, shards = 4)
    val plan = out.queryExecution.executedPlan.toString
    // the Window's required distribution is hashpartitioning(shard): one
    // Exchange; a single-partition global sort would show SinglePartition
    val shuffles = plan.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(shuffles == 1, s"expected exactly 1 shuffle Exchange, plan:\n$plan")
    assert(!plan.contains("SinglePartition"), s"global-sort window in plan:\n$plan")
  }

  test("ffd rejects docs longer than seqLen") {
    val d = Seq((1L, 10L), (2L, 999L)).toDF("id", "nt")
    val e = intercept[IllegalArgumentException](Packing.ffd(d, "id", "nt", 100, 2))
    assert(e.getMessage.contains("longer than seqLen"))
  }
}
