package graft.operators

import graft.SparkTestBase

/** Random sweep pinning both chunkers against independent plain-Scala
  * window references across (maxTokens/maxChars, overlap) shapes —
  * boundary-exact lengths, stride-1 maximal overlap, windows larger than
  * any document, single-token/char docs, and whitespace-edge texts. The
  * regression net for the window-count formula
  * (`1 + ceil((n − max)/stride)`) and the explode-folded zero-row drop. */
class ChunkingPropertySpec extends SparkTestBase {

  import spark.implicits._

  /** First-principles reference: step by stride, emitting [s, s+max),
    * until a window reaches the end of the document — no shared formula
    * with the engine's closed-form window count. */
  private def refWindows[T](items: Seq[T], max: Int, overlap: Int): Seq[Seq[T]] = {
    if (items.isEmpty) return Seq.empty
    val stride = max - overlap
    val out = Seq.newBuilder[Seq[T]]
    var s = 0
    var more = true
    while (more) {
      out += items.slice(s, s + max)
      if (s + max >= items.size) more = false else s += stride
    }
    out.result()
  }

  test("chunkByTokens == reference windows on random corpora and shapes") {
    val rnd = new scala.util.Random(31L)
    val shapes = Seq((4, 0), (4, 1), (4, 3), (7, 2), (32, 8), (100, 0))
    for (trial <- 1 to 5; (max, ov) <- shapes) {
      val docs = (0 until 40).map { i =>
        val n = rnd.nextInt(12) match {
          case 0 => 0 // empty
          case 1 => 1
          case 2 => max // boundary-exact
          case 3 => max + 1
          case _ => rnd.nextInt(30)
        }
        val pad = if (rnd.nextBoolean()) "  " else ""
        (i.toLong, pad + (1 to n).map(j => s"t$j").mkString(" ") + pad)
      }
      val got = Chunking.chunkByTokens(docs.toDF("doc_id", "text"), "text", max, ov)
        .select("doc_id", "chunk", "chunk_text")
        .as[(Long, Int, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      docs.foreach { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
        val want = refWindows(toks, max, ov).map(_.mkString(" "))
        assert(got.getOrElse(id, Seq.empty) == want,
          s"trial $trial (max=$max ov=$ov) doc $id (${toks.size} tokens)")
      }
    }
  }

  test("chunkByChars == reference windows on random texts and shapes") {
    val rnd = new scala.util.Random(77L)
    val shapes = Seq((3, 0), (5, 2), (6, 5), (64, 16))
    for (trial <- 1 to 5; (max, ov) <- shapes) {
      val docs = (0 until 40).map { i =>
        val n = rnd.nextInt(10) match {
          case 0 => 0
          case 1 => max
          case 2 => max + 1
          case _ => rnd.nextInt(40)
        }
        // printable chars incl. spaces/tabs — byte fidelity must keep them
        val chars = (0 until n).map(_ => " \tabXY9.!"(rnd.nextInt(9))).mkString
        (i.toLong, chars)
      }
      val got = Chunking.chunkByChars(docs.toDF("doc_id", "text"), "text", max, ov)
        .select("doc_id", "chunk", "chunk_text")
        .as[(Long, Int, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      docs.foreach { case (id, text) =>
        val want = refWindows(text.toSeq, max, ov).map(_.mkString)
        assert(got.getOrElse(id, Seq.empty) == want,
          s"trial $trial (max=$max ov=$ov) doc $id (${text.length} chars)")
      }
    }
  }
}
