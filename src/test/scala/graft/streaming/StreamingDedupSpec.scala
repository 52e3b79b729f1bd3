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

  test("corpus-df state: boilerplate shared with the corpus no longer reads as near-dup") {
    // every corpus doc = 3 unique words + a 9-word boilerplate footer;
    // with unigram shingles J(any two) = 9/15 = 0.6. A novel doc sharing
    // ONLY the footer scores 0.6 >= threshold against every corpus doc.
    val footer = (1 to 9).map(i => s"f$i")
    def doc(tag: String) =
      (Seq(s"${tag}a", s"${tag}b", s"${tag}c") ++ footer).mkString(" ")
    val corpus = (1L to 10L).map(i => (i, doc(s"u$i"))).toDF("id", "text")
    val dfState = graft.operators.Dedup.shingleDf(
      corpus.select($"id", $"text".as("t")), "id", "t", n = 1)
    val cfg1 = DedupGateConfig("id", "text", n = 1, bands = 8,
      threshold = 0.6, maxCorpusShingleDf = 5L)
    val keys = StreamingDedup.rebuildKeys(corpus, dfState, cfg1)
    val batch = Seq((100L, doc("x"))).toDF("id", "text")

    // WITHOUT the corpus-df state the batch-universe df of the footer is
    // tiny, nothing is capped, and the novel doc is wrongly dropped
    val blind = StreamingDedup.admit(batch, corpus,
      graft.operators.Dedup.minhashBandKeys(corpus, "id", "text", 1, 8),
      cfg1.copy(maxCorpusShingleDf = Long.MaxValue))
    assert(blind.isEmpty, "expected the df-blind gate to drop the boilerplate doc")

    // WITH it, footer shingles (df = 10 > 5) carry no signal: admitted
    val (novel, novelKeys, delta) =
      StreamingDedup.admitWithState(batch, corpus, keys, dfState, cfg1)
    assert(novel.select("id").as[Long].collect().toSeq == Seq(100L))
    assert(novelKeys.select("id").distinct().as[Long].collect().toSeq == Seq(100L))
    // the delta measures the FULL universe (footer included): state keeps
    // counting excluded shingles
    val merged = graft.operators.Dedup.mergeShingleDf(dfState, delta)
    val f1 = graft.operators.Dedup.shingleDf(
        Seq((0L, "f1")).toDF("id", "t"), "id", "t", 1)
      .select("h").as[Long].head()
    assert(merged.filter($"h" === f1).select("df").as[Long].head() == 11L)

    // a TRUE near-dup (unique words shared too) is still caught by the
    // df-aware gate: all of doc 1's unique words plus one new word —
    // kept universes {u1a,u1b,u1c} vs {u1a,u1b,u1c,zz}, J = 3/4 >= 0.5
    val nearDup = Seq((200L,
      (Seq("u1a", "u1b", "u1c", "zz") ++ footer).mkString(" "))).toDF("id", "text")
    val cfg2 = cfg1.copy(threshold = 0.5)
    val (novel2, _, _) =
      StreamingDedup.admitWithState(nearDup, corpus,
        StreamingDedup.rebuildKeys(corpus, dfState, cfg2), dfState, cfg2)
    assert(novel2.isEmpty, "true near-dup must still be dropped under exclusion")

    // rebuildKeys must IGNORE the batch-universe maxShingleDf: over the
    // full corpus that cap (tuned for micro-batch dfs) would strip nearly
    // every shingle and the rebuilt index would cover nothing
    val rebuilt = StreamingDedup.rebuildKeys(corpus, dfState,
      cfg1.copy(maxShingleDf = 1L))
    assert(rebuilt.select("id").distinct().count() == 10,
      "batch-universe cap leaked into the corpus rebuild")
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

  test("streaming decontamination: eval-gram exclusion composes with the dedup gate") {
    // containment vs a FIXED eval set is batch-local (no corpus state), so
    // decontamination-at-ingest is decontaminateExact ∘ dedup-gate inside
    // the same micro-batch plan — same composition story as the quality
    // gate above; the broadcast eval gram set is built once per batch
    val question = (1 to 14).map(i => s"eval$i").mkString(" ")
    val evalSet = Seq((100L, question)).toDF("id", "text")
    val (corpus, keys) = emptyState
    val batch = Seq(
      (1L, base),                                   // novel, clean -> admitted
      (2L, other + " " + question),                 // quotes the eval doc -> dropped
      (3L, base + " today")                         // near-dup of 1 -> dropped
    ).toDF("id", "text")
    val clean = graft.operators.Dedup.decontaminateExact(
      batch, evalSet, "id", "text", n = 13)
    val admitted = StreamingDedup.admit(clean, corpus, keys, cfg)
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

  test("dedupedAppendWriterWithDf: the df state accumulates admitted docs' shingles") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    stream.addData((1L, base), (2L, other))
    stream.addData((3L, base + " today"), (4L, third))

    var docs = Seq.empty[(Long, String)]
    var keys = Seq.empty[(Long, Int, String)]
    var dfs = Seq.empty[(Long, Long)]
    val q = StreamingDedup.dedupedAppendWriterWithDf(
      stream.toDF.toDF("id", "text"),
      cfg,
      readState = () => (
        docs.toDF("id", "text"), keys.toDF("id", "band", "bkey"), dfs.toDF("h", "df")),
      writeState = (d, k, f) => {
        docs = d.collect().toSeq.map(r => (r.getLong(0), r.getString(1)))
        keys = k.collect().toSeq.map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        dfs = f.collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
      }
    ).start()
    q.awaitTermination(120000)

    assert(docs.map(_._1).toSet == Set(1L, 2L, 4L)) // 3 is a near-dup of 1
    // df state counts every admitted doc's shingles exactly once: no
    // shingle can exceed the admitted-doc count, and the state is nonempty
    assert(dfs.nonEmpty && dfs.forall(_._2 <= 3L), s"df state: ${dfs.take(5)}")
    // shingles appearing in two admitted docs would show df=2; at minimum
    // the totals line up with a direct recount over the final corpus
    val recount = graft.operators.Dedup.shingleDf(
        docs.toDF("id", "t"), "id", "t", cfg.n)
      .as[(Long, Long)].collect().toMap
    assert(dfs.toMap == recount, "incremental df state != batch recount")
  }
}
