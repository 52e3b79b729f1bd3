package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** r13: [[LanguageModel.scoreDocs]] runs the map-side [[graft.functions
  * .LmKernel]] walk; [[LanguageModel.scoreDocsExpanded]] keeps the
  * original explode + broadcast-join + position-ordered-fold spelling as
  * the executable spec. This pins BIT-exact equality (raw doubles, no
  * rounding) on corpora exercising every scoring branch:
  *  - in-vocab bigram hits (ln(cb/cup));
  *  - backoff on unseen bigrams (ln(α·cuc/N));
  *  - OOV tokens at head, middle, and tail (unk fallbacks for cuc/cup
  *    and the mapped bigram keys);
  *  - a LITERAL `<unk>` corpus token (maps through the sink row, not a
  *    miss);
  *  - empty and single-token documents (n_tok 0/1, avg 0.0 / unigram);
  *  - passthrough columns. */
class LmKernelParitySpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the cat the cat the cat"),
    (3L, "en", "zzqx the cat plover"),          // OOV head + tail
    (4L, "en", "the zzqx cat"),                  // OOV middle
    (5L, "en", "<unk> the cat"),                 // literal unk token
    (6L, "en", ""),                              // zero tokens
    (7L, "en", "cat"),                           // single token
    (8L, "en", "  the   cat  "),                 // whitespace runs
    (9L, "en", "qq1 qq2 qq3 qq4 qq5 qq6")        // all OOV
  ).toDF("doc_id", "lang", "text")

  private def train = LanguageModel.trainBigram(
    corpus.filter($"doc_id" <= 2), "text", vocabCap = 4,
    bigramMinCount = 1, bigramCap = 10)

  test("kernel scoreDocs == expanded spec, bit-exact, all branches") {
    val lm = train
    // vocabCap 4 over a 6-type corpus guarantees real OOV→<unk> traffic
    assert(lm.unigrams.exists(_._1 == LanguageModel.Unk))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_tok", "logprob", "avg_logprob")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        java.lang.Double.doubleToLongBits(r.getDouble(3))))
      .toSet
    val kernel = rows(LanguageModel.scoreDocs(corpus, "doc_id", "text", lm))
    val spec = rows(LanguageModel.scoreDocsExpanded(corpus, "doc_id", "text", lm))
    assert(kernel == spec, s"kernel=$kernel\nspec=$spec")
    assert(kernel.size == 9)
  }

  test("passthrough columns ride the kernel path") {
    val lm = train
    val got = LanguageModel.scoreDocs(corpus, "doc_id", "text", lm,
        passthrough = Seq("lang"))
      .select("doc_id", "lang", "avg_logprob").collect()
    assert(got.length == 9 && got.forall(_.getString(1) == "en"))
  }

  test("kernel == spec on a generated mixed corpus (wide branch coverage)") {
    val lm = train
    val gen = spark.range(500).selectExpr("id as doc_id",
      """concat_ws(' ',
         case when id % 3 = 0 then 'the' else concat('w', id % 37) end,
         case when id % 2 = 0 then 'cat' else concat('v', id % 23) end,
         case when id % 5 = 0 then 'sat' else 'the' end,
         case when id % 7 = 0 then '<unk>' else 'mat' end) as text""")
    def bits(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_tok", "logprob")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
    assert(bits(LanguageModel.scoreDocs(gen, "doc_id", "text", lm)) ==
      bits(LanguageModel.scoreDocsExpanded(gen, "doc_id", "text", lm)))
  }
}
