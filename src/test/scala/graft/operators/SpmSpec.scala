package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SpmSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "table table tablet value value evaluate"),
    (2L, "table value tab let eval uate table"),
    (3L, "stable tables value values tab table"))

  test("train: fixed support, probs normalize, mass moves to real pieces") {
    val df = corpus.toDF("doc_id", "text")
    val freq = Bpe.wordFreq(df, "text", 100)
    val cands = Spm.candidates(freq, maxWordLen = 12, maxPieceLen = 4,
      candCap = 200)
    val init = Spm.initModel(cands, 4)
    val m = Spm.train(df, "text", maxWordTypes = 100, maxWordLen = 12,
      maxPieceLen = 4, candCap = 200, iters = 2)
    // support is the candidate table, piece-ascending, both rounds
    assert(m.pieces.map(_._1) === init.pieces.map(_._1))
    assert(math.abs(m.pieces.map(_._2).sum - 1d) < 1e-9)
    assert(m.pieces.forall(_._2 > 0d))
    // EM concentrates: the frequent 4-gram 'tabl' must gain mass over
    // its init share (it explains 'table'/'tablet'/'tables' jointly)
    val pInit = init.pieces.toMap
    val pEm = m.pieces.toMap
    assert(pEm("tabl") > pInit("tabl"),
      s"tabl ${pInit("tabl")} -> ${pEm("tabl")}")
    // single code points always survive the cap
    assert("tablevsu".forall(c => pEm.contains(c.toString)))
  }

  test("candidates: cap by (count desc, piece asc), singles exempt") {
    val freq = Seq(("aab", 10L), ("ab", 5L), ("zz", 1L))
    val got = Spm.candidates(freq, 12, 3, candCap = 2)
    // weights: a=25, ab=15, aa=10, aab=10, b=15, z=2(x? zz: z occurs 2x ->2), zz=1
    // top2 by (cnt desc, piece asc): a(25), ab(15)/b(15) -> 'ab' < 'b'
    val kept = got.toMap
    assert(kept.contains("a") && kept.contains("ab"))
    // singles exempt from the cap
    assert(kept.contains("b") && kept.contains("z"))
    assert(!kept.contains("aa") && !kept.contains("aab") && !kept.contains("zz"))
    // word longer than maxWordLen contributes nothing
    val got2 = Spm.candidates(Seq(("abcdef", 1L)), maxWordLen = 3,
      maxPieceLen = 2, candCap = 10)
    assert(got2.isEmpty)
  }

  test("distributed E-step == driver fold") {
    val df = corpus.toDF("doc_id", "text")
    val freq = Bpe.wordFreq(df, "text", 100)
    val m = Spm.initModel(Spm.candidates(freq, 12, 4, 200), 4)
    val dist = Spm.expectedCounts(spark, freq, m, 12).toMap
    val pm = m.pieces.toMap
    val drv = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    freq.filter(w => Spm.cpCount(w._1) <= 12).foreach { case (w, c) =>
      Spm.wordExpectations(w, c, pm, 4).foreach { case (p, e) =>
        drv.update(p, drv.getOrElse(p, 0d) + e)
      }
    }
    assert(dist.keySet === drv.keySet)
    dist.foreach { case (p, e) =>
      assert(math.abs(e - drv(p)) <= 1e-9 * math.max(1d, math.abs(e)),
        s"piece $p: $e vs ${drv(p)}")
    }
    // expected total mass == total pieces in all segmentations' posteriors:
    // each word contributes cnt × E[#pieces] ≥ cnt × ceil(len/L)
    assert(dist.values.sum > 0d)
  }

  test("kernel Viterbi == independent driver segmenter, random corpora") {
    val rnd = new scala.util.Random(11)
    val pieces = Seq("a" -> -3.0, "b" -> -3.5, "ab" -> -2.0, "ba" -> -2.5,
      "aba" -> -2.25, "c" -> -4.0, "abc" -> -3.0, "😀" -> -1.5,
      "x😀" -> -1.0, "x" -> -3.0)
    val lp = pieces.toMap
    def tok() = (0 until 1 + rnd.nextInt(8))
      .map(_ => "ab ba c a b x 😀 q".split(" ")(rnd.nextInt(8))).mkString
    val toks = (0 until 400).map(i => (i.toLong, tok()))
    val got = toks.toDF("id", "tok")
      .select($"id", graft.functions.SpmSegmentToken($"tok", pieces, 3).as("seg"))
      .as[(Long, Seq[String])].collect().toMap
    toks.foreach { case (id, t) =>
      val want = Spm.segmentWord(t, lp, 3)
      assert(got(id) === want, s"token '$t'")
      // segmentation covers the token exactly
      assert(got(id).mkString === t)
    }
  }

  test("unknown single code points segment at UnkLogProb, never lost") {
    val pieces = Seq("ab" -> -1.0)
    val got = Seq((1L, "aqb")).toDF("id", "tok")
      .select(graft.functions.SpmSegmentToken($"tok", pieces, 2))
      .as[Seq[String]].head
    assert(got === Seq("a", "q", "b")) // all unknown singles
  }

  test("vocab: prune keeps singles, renormalizes to log-probs") {
    val m = Spm.SpmModel(Seq(("a", 0.3), ("ab", 0.5), ("b", 0.1),
      ("zq", 0.1)).sortBy(_._1), 2)
    val v = Spm.vocab(m, 1).toMap
    // top-1 is 'ab'; singles 'a','b' exempt; 'zq' pruned
    assert(v.keySet === Set("a", "ab", "b"))
    val mass = v.values.map(math.exp).sum
    assert(math.abs(mass - 1d) < 1e-9)
  }

  test("save/load round-trips exactly; token count composes") {
    val df = corpus.toDF("doc_id", "text")
    val m = Spm.train(df, "text", 100, 12, 4, 200, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("spm").toString
    Spm.spmSave(spark, dir, m)
    val back = Spm.spmLoad(spark, dir)
    assert(back.pieces === m.pieces && back.maxPieceLen === m.maxPieceLen)
    val v = Spm.vocab(m, 40)
    val counts = df.select($"doc_id",
        Spm.spmTokenCount($"text", v, 4).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ > 0L))
    // segments rebuild each token byte-exactly
    val rebuilt = df.select($"doc_id",
        transform(Spm.segmentTokens($"text", v, 4),
          seg => concat_ws("", seg)).as("toks"),
        graft.functions.TextAnalysis.tokens($"text").as("want"))
      .filter($"toks" =!= $"want").count()
    assert(rebuilt === 0L)
  }
}
