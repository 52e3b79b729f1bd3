package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Token-window chunking: window boundaries, overlap coverage, edge
  * documents, and the manifest invariant. */
class ChunkingSpec extends SparkTestBase {

  import spark.implicits._

  private def chunksOf(text: String, maxTokens: Int, overlap: Int): Seq[(Int, String, Int)] =
    Chunking.chunkByTokens(Seq((1L, text)).toDF("doc_id", "text"),
        "text", maxTokens, overlap)
      .select("chunk", "chunk_text", "n_tok")
      .as[(Int, String, Int)].collect().sortBy(_._1).toSeq

  private def sentChunks(text: String, maxChars: Int): Seq[(Int, String)] =
    Chunking.chunkBySeparator(Seq((1L, text)).toDF("doc_id", "text"),
        "text", ". ", maxChars)
      .select("chunk", "chunk_text")
      .as[(Int, String)].collect().sortBy(_._1).toSeq

  test("chunkBySeparator: greedy packing at boundaries, no mid-segment split") {
    // segments: "aaaa"(4) "bb"(2) "cccccc"(6) "d"(1); max 10
    val got = sentChunks("aaaa. bb. cccccc. d", 10)
    assert(got === Seq((0, "aaaa. bb"), (1, "cccccc. d")))
    // joining exactly at the budget fits
    assert(sentChunks("aaaa. bbbb", 10) === Seq((0, "aaaa. bbbb")))
    // over-budget single segment becomes its own chunk, unsplit
    assert(sentChunks("tiny. averyveryverylongsegment. x", 10) ===
      Seq((0, "tiny"), (1, "averyveryverylongsegment"), (2, "x")))
    // reassembly: chunks joined by the separator reproduce the text
    val t = "one. two. three. four. five"
    assert(sentChunks(t, 12).map(_._2).mkString(". ") === t)
    // separator-free text is one chunk; empty text is one empty chunk
    assert(sentChunks("no separator here", 5) ===
      Seq((0, "no separator here")))
    assert(sentChunks("", 5) === Seq((0, "")))
  }

  test("windows: stride, overlap, short tail, exact coverage") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    // maxTokens 4, overlap 1 → stride 3: [1..4] [4..7] [7..10]
    val got = chunksOf(text, 4, 1)
    assert(got == Seq(
      (0, "t1 t2 t3 t4", 4),
      (1, "t4 t5 t6 t7", 4),
      (2, "t7 t8 t9 t10", 4)))
    // maxTokens 4, overlap 0, 10 tokens → 4,4,2 (short tail kept)
    val noOv = chunksOf(text, 4, 0)
    assert(noOv.map(_._3) == Seq(4, 4, 2))
    assert(noOv.last._2 == "t9 t10")
  }

  test("boundary-exact document: no empty trailing window") {
    val text = (1 to 8).map(i => s"t$i").mkString(" ")
    // n == 2·stride + overlap exactly fills the last full window:
    // maxTokens 4 overlap 0 → two windows, never a third empty one
    assert(chunksOf(text, 4, 0).size == 2)
    // and with overlap: n=8, max=5, stride=3 → ceil((8-5)/3)=1 → 2 windows
    val ov = chunksOf(text, 5, 2)
    assert(ov.size == 2 && ov.last._2 == "t4 t5 t6 t7 t8")
  }

  test("short and empty documents") {
    assert(chunksOf("one two", 32, 8) == Seq((0, "one two", 2)))
    assert(chunksOf("", 32, 8).isEmpty)
    assert(chunksOf("  \t \n ", 32, 8).isEmpty)
  }

  test("case and inter-token whitespace: case kept, spacing normalized") {
    val got = chunksOf("Hello\t WORLD\n again", 32, 0)
    assert(got == Seq((0, "Hello WORLD again", 3)))
  }

  test("manifest invariant: total_tok == n + (chunks-1)*overlap") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")),
      (2L, (1 to 32).map(i => s"w$i").mkString(" ")),
      (3L, (1 to 33).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val ch = Chunking.chunkByTokens(docs, "text", 32, 8)
    val m = Chunking.chunkManifest(ch, "doc_id")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val ns = Map(1L -> 100L, 2L -> 32L, 3L -> 33L)
    ns.foreach { case (id, n) =>
      val (chunks, tot) = m(id)
      assert(tot == n + (chunks - 1) * 8, s"doc $id coverage broken")
    }
    assert(m(2L)._1 == 1) // exactly maxTokens → one window
    assert(m(3L)._1 == 2) // one token past → a second (overlapping) window
  }

  test("chunkByChars: byte-fidelity windows, overlap, edges") {
    val text = "AB  cd\tEF\n12345"
    val got = Chunking.chunkByChars(Seq((1L, text)).toDF("doc_id", "text"),
        "text", 6, 2)
      .select("chunk", "chunk_text", "n_chars")
      .as[(Int, String, Int)].collect().sortBy(_._1).toSeq
    // stride 4: [0,6) [4,10) [8,14) [12,15) — original bytes verbatim
    assert(got == Seq(
      (0, "AB  cd", 6), (1, "cd\tEF\n", 6), (2, "F\n1234", 6), (3, "345", 3)))
    // exact fit: no empty trailing window; empty doc: no chunks
    assert(Chunking.chunkByChars(Seq((1L, "abcdef")).toDF("doc_id", "text"),
      "text", 3, 0).count() == 2)
    assert(Chunking.chunkByChars(Seq((1L, "")).toDF("doc_id", "text"),
      "text", 3, 0).count() == 0)
    val e = intercept[IllegalArgumentException](
      Chunking.chunkByChars(Seq((1L, "x")).toDF("doc_id", "text"), "text", 3, 3))
    assert(e.getMessage.contains("overlap"))
  }

  test("every input column survives; contracts are loud") {
    val docs = Seq((1L, "en", "a b c")).toDF("doc_id", "lang", "text")
    val ch = Chunking.chunkByTokens(docs, "text", 2, 0)
    assert(ch.columns.toSeq == Seq("doc_id", "lang", "text", "chunk", "chunk_text", "n_tok"))
    assert(ch.count() == 2)
    val e = intercept[IllegalArgumentException](
      Chunking.chunkByTokens(docs, "text", 4, 4))
    assert(e.getMessage.contains("overlap"))
    val clash = Seq((1L, "x", 0)).toDF("doc_id", "text", "chunk")
    val e2 = intercept[IllegalArgumentException](
      Chunking.chunkByTokens(clash, "text", 4, 0))
    assert(e2.getMessage.contains("rename"))
  }
}
