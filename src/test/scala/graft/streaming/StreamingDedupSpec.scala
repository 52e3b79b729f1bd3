package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.streaming.StreamingDedup.DedupGateConfig

/** Incremental dedup gate: micro-batches are admitted only if novel
  * vs the accumulated corpus AND within their own batch. */
class StreamingDedupSpec extends SparkTestBase {

  import spark.implicits._

  private val cfg = DedupGateConfig("id", "text", n = 3, bands = 4, threshold = 0.5)

  private val base = "the quick brown fox jumps over the lazy dog again and again"
  private val other = "a completely different sentence about spark query engines at scale"
  private val third = "unrelated words entirely banana apple orange grape melon kiwi"

  private def emptyState: (DataFrame, DataFrame) = (
    Seq.empty[(Long, String)].toDF("id", "text"),
    Seq.empty[(Long, Int, String)].toDF("id", "band", "bkey"))

  test("admit: batch-internal dup clusters keep min id; corpus dups dropped") {
    val (corpus0, keys0) = emptyState
    val batch1 = Seq(
      (1L, base), (2L, other),
      (3L, base + " today") // near-dup of 1 within the batch
    ).toDF("id", "text")
    val admitted1 = StreamingDedup.admit(batch1, corpus0, keys0, cfg)
      .select("id").as[Long].collect().toSet
    assert(admitted1 == Set(1L, 2L))

    // simulate the writer's state advance
    val corpus1 = batch1.filter($"id".isin(1L, 2L))
    val keys1 = graft.operators.Dedup.minhashBandKeys(corpus1, "id", "text", 3, 4)
    val batch2 = Seq(
      (4L, base + " once more"), // near-dup of corpus doc 1 -> dropped
      (5L, third)                // novel -> admitted
    ).toDF("id", "text")
    val admitted2 = StreamingDedup.admit(batch2, corpus1, keys1, cfg)
      .select("id").as[Long].collect().toSet
    assert(admitted2 == Set(5L))
  }

  test("shared-sink batch dups resolve as ONE component (a~c, b~c, a!~b keeps only a)") {
    // unigram shingles make the Jaccards exact by construction:
    //   c = {w1..w10}; a = {w1..w8, xa1, xa2}; b = {w3..w10, xb1, xb2}
    //   J(a,c) = J(b,c) = 8/12 = 0.667 >= 0.6; J(a,b) = 6/14 = 0.43 < 0.6
    // pairwise id_b-loser-dropping would drop only c (the lone id_b) and
    // admit BOTH a and b; resolve treats {a,b,c} as one component -> min id
    val w = (1 to 10).map(i => s"w$i")
    val trio = Seq(
      (1L, (w.take(8) ++ Seq("xa1", "xa2")).mkString(" ")),
      (2L, (w.drop(2) ++ Seq("xb1", "xb2")).mkString(" ")),
      (3L, w.mkString(" ")),
      (4L, third)).toDF("id", "text")
    val (corpus0, keys0) = emptyState
    val c1 = DedupGateConfig("id", "text", n = 1, bands = 8, threshold = 0.6)
    val admitted = StreamingDedup.admit(trio, corpus0, keys0, c1)
      .select("id").as[Long].collect().toSet
    assert(admitted == Set(1L, 4L), s"expected component {1,2,3} to keep 1, got $admitted")
  }

  test("replayed ids never corrupt the verify or duplicate corpus state") {
    val corpus = Seq((1L, base), (2L, other)).toDF("id", "text")
    val keys = graft.operators.Dedup.minhashBandKeys(corpus, "id", "text", 3, 4)
    // id 1 replays with CHANGED text (at-least-once replay / id reuse) and
    // id 6 arrives twice within the batch — without the id guards both
    // would merge two documents' shingle sets under one id in the verify
    val batch = Seq(
      (1L, third),            // id already in corpus -> dropped as replay
      (6L, third + " extra"), // intra-batch same-id pair: one survives
      (6L, other + " noise"),
      (7L, base + " today")   // near-dup of corpus doc 1 -> dropped
    ).toDF("id", "text")
    val admitted = StreamingDedup.admit(batch, corpus, keys, cfg)
    val ids = admitted.select("id").as[Long].collect().toList
    assert(ids.count(_ == 6L) == 1, s"id 6 admitted ${ids.count(_ == 6L)} times")
    assert(!ids.contains(1L), "replayed corpus id re-admitted")
    assert(!ids.contains(7L), "corpus near-dup admitted")
  }

  test("streaming curation: quality gate composes with the dedup gate") {
    // the Gopher gate is a pure column predicate, so curation-at-ingest is
    // gate-filter ∘ dedup-gate inside the same micro-batch plan — no new
    // operator needed, which is the point of column-composable quality rules
    val longDoc = ("the cat and dog sat in the big warm hat today " * 5) +
      "extra words beyond fifty tokens are needed here now okay fine"
    val (corpus, keys) = emptyState
    val batch = Seq(
      (1L, longDoc),                    // passes gate, novel -> admitted
      (2L, "too short to pass the gate"),
      (3L, longDoc + " dup variant")    // passes gate but near-dup of 1
    ).toDF("id", "text")
    val gated = batch.filter(graft.functions.TextAnalysis.gopherGate($"text"))
    val admitted = StreamingDedup.admit(gated, corpus, keys, cfg)
      .select("id").as[Long].collect().toSet
    assert(admitted == Set(1L))
  }

  test("dedupedAppendWriter: state accumulates only novel docs across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    stream.addData((1L, base), (2L, other), (3L, base + " today"))
    stream.addData((4L, base + " once more"), (5L, third))

    var state = emptyState
    val q = StreamingDedup.dedupedAppendWriter(
      stream.toDF.toDF("id", "text"),
      cfg,
      readState = () => state,
      writeState = (docs, keys) => state = (
        docs.collect().toSeq.map(r => (r.getLong(0), r.getString(1))).toDF("id", "text"),
        keys.collect().toSeq.map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
          .toDF("id", "band", "bkey"))
    ).start()
    q.awaitTermination(120000)

    val ids = state._1.select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 5L), s"corpus ids $ids")
    // the index covers exactly the admitted docs
    val keyIds = state._2.select("id").as[Long].collect().toSet
    assert(keyIds == Set(1L, 2L, 5L))
  }
}
