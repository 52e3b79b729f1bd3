package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis._

/** Text-analysis operators over the `documents` table, each with a DuckDB
  * oracle. Pure column pipelines — a single scan, no shuffle. */
object TextQueries {

  private def stats(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      bpeishTokenCount(col("text")).as("n_bpeish"),
      when(length(col("text")) === 0, 0L)
        .otherwise(fingerprint(col("text"))).as("fp"))

  private def quality(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      round(qualityScore(col("text")), 6).as("quality"))

  private def langid(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    val counts = Stopwords.map { case (l, _) =>
      stopwordCount(col("text"), l).as(s"c_$l")
    }
    d.select(col("doc_id") +: counts :+ languageId(col("text")).as("lang_pred"): _*)
  }

  /** PII scrubbing over text with deterministically injected emails/phones
    * (the raw corpus is clean, so both engines plant the same PII first). */
  private def redact(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .withColumn("text", concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-000-"),
        col("doc_id"), lit(" now")))
    d.select(
      col("doc_id"),
      countMatches(col("text"), EmailPattern).as("n_emails"),
      countMatches(col("text"), PhonePattern).as("n_phones"),
      redactPii(col("text")).as("redacted"))
  }

  /** Corpus token statistics per language: counts + exact interpolated
    * percentiles of the token-count distribution. */
  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("lang"), tokenCount(col("text")).cast("double").as("nt"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("nt")), 1).as("total_tokens"),
        round(expr("percentile(nt, 0.5)"), 4).as("p50"),
        round(expr("percentile(nt, 0.9)"), 4).as("p90"),
        round(expr("percentile(nt, 0.99)"), 4).as("p99"))

  /** Per-language vocabulary size + token totals
    * ([[graft.operators.Stats.vocabulary]], exact mode — the approx/HLL
    * mode is the 100-TB spelling, spec-bounded against this one). */
  private def vocab(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.vocabulary(Tables(s, dir, "documents"), "lang", "text")

  /** The HLL vocabulary mode (the 100-TB spelling) as an ORACLED query:
    * a sketch estimate can't be replayed in SQL bit-exactly, so the query
    * emits the exact per-language vocabulary (replayable) PLUS a boolean
    * `hll_ok` = |estimate − exact| ≤ 3·rsd·exact, and the oracle pins
    * `hll_ok` to TRUE — the bound itself is driver-verified (a sketch
    * regression hash-mismatches), not just spec-bounded in-suite. The
    * sketch is deterministic for fixed data, so this cannot flake. */
  private def vocabApprox(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    val exact = graft.operators.Stats.vocabulary(d, "lang", "text")
    val approx = graft.operators.Stats
      .vocabulary(d, "lang", "text", approx = true, rsd = 0.05)
      .select(col("lang"), col("vocab").as("__hll"))
    exact.join(approx, Seq("lang"))
      .select(col("lang"), col("vocab"), col("total_tokens"),
        (abs(col("__hll").cast("double") - col("vocab")) <=
          col("vocab") * (3 * 0.05)).as("hll_ok"))
  }

  /** Gopher-style quality signals + the conjunctive gate — one scan, pure
    * codegen'd column math, no shuffle (the 100-TB shape for per-doc
    * filtering). */
  private def gopher(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      tokenCount(col("text")).as("n_words"),
      round(meanWordLength(col("text")), 6).as("mean_word_len"),
      round(alphaWordFraction(col("text")), 6).as("alpha_frac"),
      round(symbolWordRatio(col("text")), 6).as("symbol_ratio"),
      round(dupWordFraction(col("text")), 6).as("dup_word_frac"),
      gopherGate(col("text")).as("passes"))

  /** Gopher repetition metrics per document, long format (doc_id, n):
    * densest n-gram's character coverage + duplicated-occurrence fraction
    * for n ∈ {2, 3}. Per-DOC gram frequencies are a map-side kernel
    * ([[graft.functions.GramStats]], codegen'd single pass, no shuffle) —
    * the first cut exploded grams through two aggregations and was the
    * slowest bench query for no distributed benefit. */
  private def repetition(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
    Seq(2, 3).map(n =>
        d.select(col("doc_id"), length(col("text")).as("n_chars"),
          lit(n).as("n"), graft.functions.GramStats(col("text"), n).as("s")))
      .reduce(_ unionByName _)
      .filter(col("s.n_grams") > 0) // <n-token docs, like the oracle's WHERE
      .select(col("doc_id"), col("n"),
        round(col("s.top_cover").cast("double") / col("n_chars"), 6).as("top_frac"),
        round(col("s.dup_occ").cast("double") / col("s.n_grams"), 6).as("dup_frac"))
  }

  /** Step-zero web cleaning ([[graft.functions.TextClean]]) over
    * deterministically HTML-decorated documents (the raw corpus is plain
    * text, so both engines wrap it in the same markup first — the
    * `text_redact` trick). The decoration exercises every scope rule:
    * script content with a bare `<` inside (dropped WITH the element), a
    * comment, attribute-bearing and self-closing tags, the entity subset
    * including the `&amp;lt;` double-decode guard, a control byte, and
    * whitespace runs. */
  private def cleanHtml(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").withColumn("html", concat(
      lit("<div id=\""), col("doc_id"),
      lit("\"><script>var x = 1 < 2;</script><style>p { color: red }</style>"),
      lit("<!-- hidden --><p class=\"b\">  "), col("text"),
      lit("  &amp;lt; x &lt; y&nbsp;&gt; z &#39;q&apos; a\u0007b</p><br/></div>")))
    d.select(col("doc_id"),
      graft.functions.TextClean.cleanText(col("html")).as("cleaned"))
  }

  /** The dataset card: one reporting row per language — doc and token
    * counts, Gopher pass rate, exact-duplicate count, mean quality —
    * the per-slice summary a curation run publishes with its output.
    * Counts are exact integers; the single mean rounds at 6. */
  /** `dup_docs` counts exact duplicates by the repo's 61-bit text
    * identity (r12, VERDICT r11 #2): `countDistinct(text)` ships every
    * document byte through the aggregation exchange — at 100 TB that is
    * the corpus itself — where the hash ships 8 bytes/row. Collision
    * envelope: 61-bit PolyHash pair, ~n²/2^62 expected collisions
    * (≪ 1 up to ~10⁹ docs); the oracle replays the SAME hash, so a
    * collision perturbs both engines identically. */
  private def datasetCard(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(tokenCount(col("text"))).as("total_tokens"),
      sum(when(gopherGate(col("text")), 1L).otherwise(0L)).as("gopher_pass"),
      (count(lit(1)) -
        countDistinct(graft.operators.Dedup.tokHash61(col("text")))).as("dup_docs"),
      round(avg(qualityScore(col("text"))), 6).as("avg_quality"))

  /** Token Shannon entropy per document (nats) — the low-diversity
    * signal; sorted-fold kernel, replayed addend-for-addend. */
  private def entropy(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        round(graft.functions.TextAnalysis.tokenEntropy(col("text")), 6).as("ent"))

  /** C4-style bad-phrase page filter: token-boundary phrase hits drop
    * the whole document ("broken pipe" is a planted zero-hit entry — the
    * census proves no false positives, the other two bite at ~10%). */
  private val BadPhrases = Seq("slow scan", "big vector", "broken pipe")

  private def badwords(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("hit",
        graft.functions.TextAnalysis.containsAnyPhrase(col("text"), BadPhrases))
      .groupBy("lang").agg(
        sum(when(col("hit"), 0L).otherwise(1L)).as("n_kept"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_dropped"))

  /** Card synthesis: one spelled card per doc — two Luhn-valid formats
    * (spaced Visa-like, dashed Amex-like) and one Luhn-INVALID 16-digit
    * run that must survive redaction (the false-positive control). The
    * trailing ` ref doc_id` plants a short digit run below the 13-digit
    * candidate floor. ONE SQL string for both engines. */
  private val SynthCardSql =
    """concat(text, ' pay ',
      |  CASE WHEN doc_id % 3 = 0 THEN '4532 0151 1283 0366'
      |       WHEN doc_id % 3 = 1 THEN '379-3545-0816-2306'
      |       ELSE '1234 5678 9012 3456' END,
      |  ' ref ', doc_id)""".stripMargin

  private def redactCardsQ(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextAnalysis
    Tables(s, dir, "documents")
      .select(col("doc_id"), expr(SynthCardSql).as("text"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit(TextAnalysis.CardCandidatePattern), lit(0))).as("n_candidates"),
        size(TextAnalysis.validCards(col("text"))).as("n_valid"),
        TextAnalysis.redactCards(col("text")).as("redacted"))
  }

  /** Secret/IP synthesis: every doc gains one mixed-class 34-char key
    * (redacts), one 30-char pure-letter word (false-positive control —
    * must survive), and one IPv4. ONE SQL string for both engines. */
  private val SynthSecretSql =
    """concat(text, ' key sk', lpad(CAST(doc_id AS STRING), 6, '0'),
      | 'A1b2C3d4E5f6G7h8J9k0QwErTy',
      | ' word abcdefghijklmnopqrstuvwxyzabcd from 10.',
      | CAST(doc_id % 256 AS STRING), '.0.1 end')""".stripMargin

  private def redactSecretsQ(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextAnalysis
    Tables(s, dir, "documents")
      .select(col("doc_id"), expr(SynthSecretSql).as("text"))
      .select(col("doc_id"),
        size(TextAnalysis.validSecrets(col("text"))).as("n_secrets"),
        TextAnalysis.redactIps(
          TextAnalysis.redactSecrets(col("text"))).as("redacted"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_redact_secrets" -> (redactSecretsQ _),
    "text_redact_cards" -> (redactCardsQ _),
    "text_badwords" -> (badwords _),
    "dataset_card" -> (datasetCard _),
    "text_entropy" -> (entropy _),
    "text_clean_html" -> (cleanHtml _),
    "text_stats" -> (stats _),
    "text_quality" -> (quality _),
    "text_langid" -> (langid _),
    "text_redact" -> (redact _),
    "text_corpus_stats" -> (corpus _),
    "text_vocab" -> (vocab _),
    "text_vocab_approx" -> (vocabApprox _),
    "text_gopher" -> (gopher _),
    "text_repetition" -> (repetition _))

  // explicit whitespace class: RE2's \s lacks vertical tab, Java's has it —
  // the interpolated shared spelling keeps tokenization engine-identical
  private val toks =
    s"""list_filter(string_split_regex(lower(text), '${graft.functions.TextHash.WsRegex}'), x -> x <> '')"""

  /** The DuckDB spelling of [[graft.functions.TextClean.cleanText]] over
    * SQL expr `e` — the SAME regexes in the Java/RE2 common dialect, the
    * same operation order; DuckDB needs the explicit 'g' flag where
    * Spark's regexp_replace is global by default. */
  private def cleanSql(e: String): String = {
    val noScript =
      s"regexp_replace($e, '(?is)<script\\b[^>]*>.*?</script>', '', 'g')"
    val noStyle =
      s"regexp_replace($noScript, '(?is)<style\\b[^>]*>.*?</style>', '', 'g')"
    val noComments = s"regexp_replace($noStyle, '(?s)<!--.*?-->', '', 'g')"
    val noTags = s"regexp_replace($noComments, '(?s)<[a-zA-Z/!][^>]*>', '', 'g')"
    val entities = Seq("&lt;" -> "'<'", "&gt;" -> "'>'", "&quot;" -> "'\"'",
      "&#39;" -> "chr(39)", "&apos;" -> "chr(39)", "&nbsp;" -> "' '",
      "&amp;" -> "'&'")
      .foldLeft(noTags) { case (c, (ent, rep)) => s"replace($c, '$ent', $rep)" }
    val noCtl =
      s"regexp_replace($entities, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g')"
    val oneWs =
      s"regexp_replace($noCtl, '${graft.functions.TextHash.WsRegex}', ' ', 'g')"
    s"regexp_replace($oneWs, '^ +| +$$', '', 'g')"
  }

  private val decoratedHtml =
    """'<div id="' || doc_id || '"><script>var x = 1 < 2;</script>""" +
      """<style>p { color: red }</style><!-- hidden --><p class="b">  ' || """ +
      """text || '  &amp;lt; x &lt; y&nbsp;&gt; z &#39;q&apos; a' || """ +
      """chr(7) || 'b</p><br/></div>'"""

  def oracle: Map[String, String] = Map(
    "dataset_card" ->
      s"""WITH s AS (SELECT lang, text, $toks AS tk,
         |  len(text)::DOUBLE AS n_char,
         |  (len(text) - len(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))::DOUBLE AS punct,
         |  len(list_filter($toks,
         |      x -> x IN ('the','a','and','of','to','in','is'))) AS stops,
         |  CASE WHEN len($toks) = 0 THEN 0
         |       ELSE list_sum(list_transform($toks, x -> len(x)))::DOUBLE / len($toks) END AS mwl,
         |  CASE WHEN len($toks) = 0 THEN 0
         |       ELSE len(list_filter($toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE / len($toks) END AS af,
         |  CASE WHEN len($toks) = 0 THEN 0
         |       ELSE len(regexp_extract_all(lower(text), '#|\\.\\.\\.'))::DOUBLE / len($toks) END AS sr
         |FROM documents)
         |SELECT lang,
         |  count(*)::BIGINT AS n_docs,
         |  sum(len(tk))::BIGINT AS total_tokens,
         |  sum(CASE WHEN len(tk) >= 50 AND len(tk) <= 100000
         |            AND mwl >= 3 AND mwl <= 10 AND sr <= 0.1
         |            AND af >= 0.8 AND stops >= 2
         |           THEN 1 ELSE 0 END)::BIGINT AS gopher_pass,
         |  (count(*) - count(DISTINCT ${DedupQueries.shingleHash61("text")}))::BIGINT AS dup_docs,
         |  round(avg(
         |    0.3 * (CASE WHEN len(tk) > 0 THEN stops::DOUBLE / len(tk) ELSE 0 END)
         |    + 0.3 * (1 - (CASE WHEN n_char > 0 THEN punct / n_char ELSE 0 END))
         |    + 0.4 * least(len(tk)::DOUBLE / 100, 1.0)), 6) AS avg_quality
         |FROM s GROUP BY lang""".stripMargin,
    "text_clean_html" ->
      s"""SELECT doc_id, ${cleanSql(decoratedHtml)} AS cleaned
         |FROM documents""".stripMargin,
    "text_redact_secrets" ->
      s"""WITH t AS (SELECT doc_id, $SynthSecretSql AS text FROM documents),
         |c AS (SELECT doc_id, text,
         |        regexp_extract_all(text, '${graft.functions.TextAnalysis.SecretCandidatePattern}') AS cands
         |      FROM t),
         |e AS (SELECT doc_id, u.c0 FROM c, unnest(cands) AS u(c0)),
         |l AS (SELECT doc_id, c0,
         |        (regexp_matches(c0, '[0-9]') AND regexp_matches(c0, '[A-Za-z]')) AS ok
         |      FROM e),
         |vz AS (SELECT doc_id, list(c0 ORDER BY c0) FILTER (ok) AS valid
         |       FROM l GROUP BY doc_id)
         |SELECT c.doc_id, coalesce(len(vz.valid), 0) AS n_secrets,
         |  regexp_replace(
         |    list_reduce(list_prepend(c.text, coalesce(vz.valid, [])),
         |      (t0, c0) -> replace(t0, c0, '[SECRET]')),
         |    '${graft.functions.TextAnalysis.Ipv4Pattern}', '[IP]', 'g') AS redacted
         |FROM c LEFT JOIN vz USING (doc_id)""".stripMargin,
    // Luhn fold replayed digit-for-digit (relational spelling — DuckDB
    // forbids subqueries in lambdas, so candidates explode, validate,
    // and re-aggregate; the engine's nested-HOF spelling is equivalent)
    "text_redact_cards" ->
      s"""WITH t AS (SELECT doc_id, $SynthCardSql AS text FROM documents),
         |c AS (SELECT doc_id, text,
         |        regexp_extract_all(text, '${graft.functions.TextAnalysis.CardCandidatePattern}') AS cands
         |      FROM t),
         |e AS (SELECT doc_id, u.c0 FROM c, unnest(cands) AS u(c0)),
         |d AS (SELECT doc_id, c0,
         |        string_split(regexp_replace(c0, '[ -]', '', 'g'), '') AS dg FROM e),
         |l AS (SELECT doc_id, c0,
         |        (list_reduce(list_prepend(0,
         |           list_transform(generate_series(1, len(dg)),
         |             i -> CASE WHEN (len(dg) - i) % 2 = 1
         |                    THEN CASE WHEN 2*(dg[i]::INT) > 9
         |                         THEN 2*(dg[i]::INT) - 9 ELSE 2*(dg[i]::INT) END
         |                    ELSE dg[i]::INT END)),
         |           (a, b) -> a + b) % 10 = 0) AS ok
         |      FROM d),
         |vz AS (SELECT doc_id, list(c0 ORDER BY c0) FILTER (ok) AS valid
         |       FROM l GROUP BY doc_id)
         |SELECT c.doc_id, len(c.cands) AS n_candidates,
         |  coalesce(len(vz.valid), 0) AS n_valid,
         |  list_reduce(list_prepend(c.text, coalesce(vz.valid, [])),
         |    (t0, c0) -> replace(t0, c0, '[CARD]')) AS redacted
         |FROM c LEFT JOIN vz USING (doc_id)""".stripMargin,
    "text_badwords" ->
      s"""WITH t AS (SELECT lang,
         |  concat(' ', array_to_string($toks, ' '), ' ') AS j FROM documents),
         |h AS (SELECT lang,
         |  (${BadPhrases.map(p => s"contains(j, ' $p ')").mkString(" OR ")}) AS hit
         | FROM t)
         |SELECT lang,
         |  sum(CASE WHEN hit THEN 0 ELSE 1 END)::BIGINT AS n_kept,
         |  sum(CASE WHEN hit THEN 1 ELSE 0 END)::BIGINT AS n_dropped
         |FROM h GROUP BY lang""".stripMargin,
    // −p·ln p folded in sorted-token order — the addend order the kernel's
    // TreeMap walk pins; zero-token docs coalesce to 0
    "text_entropy" ->
      s"""WITH t AS (SELECT doc_id, unnest($toks) AS w FROM documents),
         |c AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM t GROUP BY doc_id, w),
         |n AS (SELECT doc_id, sum(c)::BIGINT AS n FROM c GROUP BY doc_id),
         |h AS (SELECT c.doc_id,
         |        list_reduce(list_prepend(0.0,
         |          list(-((c.c / n.n) * ln(c.c / n.n)) ORDER BY c.w)),
         |          (a, x) -> a + x) AS ent
         |      FROM c JOIN n USING (doc_id) GROUP BY c.doc_id)
         |SELECT d.doc_id, round(coalesce(h.ent, 0.0), 6) AS ent
         |FROM documents d LEFT JOIN h USING (doc_id)""".stripMargin,
    "text_vocab" ->
      s"""WITH t AS (SELECT lang, unnest($toks) AS tok FROM documents)
         |SELECT lang, count(DISTINCT tok) AS vocab, count(*) AS total_tokens
         |FROM t GROUP BY lang""".stripMargin,
    // the exact columns replay; hll_ok pinned TRUE verifies the sketch
    // bound through the driver gate (see vocabApprox scaladoc)
    "text_vocab_approx" ->
      s"""WITH t AS (SELECT lang, unnest($toks) AS tok FROM documents)
         |SELECT lang, count(DISTINCT tok) AS vocab, count(*) AS total_tokens,
         |       TRUE AS hll_ok
         |FROM t GROUP BY lang""".stripMargin,
    "text_stats" ->
      s"""SELECT doc_id,
         |  len($toks) AS n_tokens,
         |  len(regexp_extract_all(lower(text), '${graft.functions.TextAnalysis.BpeishPattern}')) AS n_bpeish,
         |  CASE WHEN len(text) = 0 THEN 0 ELSE
         |    list_reduce(
         |      list_prepend(0::BIGINT,
         |        list_transform(generate_series(1, len(text)), i -> ascii(text[i]))),
         |      (a, b) -> (a * 31 + b) % 1000000007)
         |  END AS fp
         |FROM documents""".stripMargin,
    "text_quality" ->
      s"""WITH s AS (SELECT doc_id,
         |  len($toks)::DOUBLE AS n_tok,
         |  len(text)::DOUBLE AS n_char,
         |  (len(text) - len(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))::DOUBLE AS punct,
         |  len(list_filter($toks,
         |      x -> x IN ('the','a','and','of','to','in','is')))::DOUBLE AS stops
         |FROM documents)
         |SELECT doc_id,
         |  -- NULL text scores NULL on both engines (engine guards it
         |  -- explicitly; here n_tok IS NULL makes the whole CASE NULL)
         |  CASE WHEN n_tok IS NULL THEN NULL ELSE
         |  round(0.3 * (CASE WHEN n_tok > 0 THEN stops / n_tok ELSE 0 END)
         |      + 0.3 * (1 - (CASE WHEN n_char > 0 THEN punct / n_char ELSE 0 END))
         |      + 0.4 * least(n_tok / 100, 1.0), 6) END AS quality
         |FROM s""".stripMargin,
    "text_redact" ->
      s"""WITH d AS (SELECT doc_id,
         |  lower(text || ' contact user' || doc_id || '@example.com or +1-555-000-' || doc_id || ' now') AS t
         |FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS n_emails,
         |  len(regexp_extract_all(t, '\\+?[0-9][0-9-]{7,}[0-9]')) AS n_phones,
         |  regexp_replace(
         |    regexp_replace(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '[EMAIL]', 'g'),
         |    '\\+?[0-9][0-9-]{7,}[0-9]', '[PHONE]', 'g') AS redacted
         |FROM d""".stripMargin,
    "text_corpus_stats" ->
      s"""WITH t AS (SELECT lang, len($toks)::DOUBLE AS nt FROM documents)
         |SELECT lang, count(*) AS n_docs, round(sum(nt), 1) AS total_tokens,
         |       round(quantile_cont(nt, 0.5), 4) AS p50,
         |       round(quantile_cont(nt, 0.9), 4) AS p90,
         |       round(quantile_cont(nt, 0.99), 4) AS p99
         |FROM t GROUP BY lang""".stripMargin,
    "text_gopher" ->
      s"""WITH t AS (SELECT doc_id, text, $toks AS tk FROM documents),
         |s AS (SELECT doc_id,
         |  len(tk) AS n_words,
         |  CASE WHEN len(tk) = 0 THEN 0
         |       ELSE list_sum(list_transform(tk, x -> len(x)))::DOUBLE / len(tk) END AS mwl,
         |  CASE WHEN len(tk) = 0 THEN 0
         |       ELSE len(list_filter(tk, x -> regexp_matches(x, '[a-z]')))::DOUBLE / len(tk) END AS af,
         |  CASE WHEN len(tk) = 0 THEN 0
         |       ELSE len(regexp_extract_all(lower(text), '#|\\.\\.\\.'))::DOUBLE / len(tk) END AS sr,
         |  CASE WHEN len(tk) = 0 THEN 0
         |       ELSE (len(tk) - len(list_distinct(tk)))::DOUBLE / len(tk) END AS dwf,
         |  len(list_filter(tk, x -> x IN ('the','a','and','of','to','in','is'))) AS stops
         |FROM t)
         |SELECT doc_id, n_words,
         |  round(mwl, 6) AS mean_word_len,
         |  round(af, 6) AS alpha_frac,
         |  round(sr, 6) AS symbol_ratio,
         |  round(dwf, 6) AS dup_word_frac,
         |  (n_words >= 50 AND n_words <= 100000 AND mwl >= 3 AND mwl <= 10
         |   AND sr <= 0.1 AND af >= 0.8 AND stops >= 2) AS passes
         |FROM s""".stripMargin,
    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, len(text) AS n_chars, $toks AS tk FROM documents),
         |ga AS (
         |  SELECT doc_id, n_chars, 2 AS n,
         |         unnest(list_transform(generate_series(1, len(tk) - 1),
         |                i -> tk[i] || ' ' || tk[i+1])) AS g
         |  FROM t WHERE len(tk) >= 2
         |  UNION ALL
         |  SELECT doc_id, n_chars, 3 AS n,
         |         unnest(list_transform(generate_series(1, len(tk) - 2),
         |                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
         |  FROM t WHERE len(tk) >= 3),
         |c AS (SELECT doc_id, n_chars, n, g, count(*) AS cnt FROM ga GROUP BY ALL)
         |SELECT doc_id, n,
         |  round(max(cnt * len(g))::DOUBLE / any_value(n_chars), 6) AS top_frac,
         |  round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::DOUBLE / sum(cnt), 6) AS dup_frac
         |FROM c GROUP BY doc_id, n""".stripMargin,
    "text_langid" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         |s AS (SELECT doc_id,
         |  len(list_filter(tk, x -> x IN ('the','a','and','of','to','in','is'))) AS c_en,
         |  len(list_filter(tk, x -> x IN ('der','die','das','und','ist','ein'))) AS c_de,
         |  len(list_filter(tk, x -> x IN ('le','la','les','et','est','un'))) AS c_fr,
         |  len(list_filter(tk, x -> x IN ('el','la','los','y','es','un'))) AS c_es
         |FROM t)
         |SELECT doc_id, c_en, c_de, c_fr, c_es,
         |  CASE WHEN greatest(c_en, c_de, c_fr, c_es) = 0 THEN 'und'
         |       WHEN c_en = greatest(c_en, c_de, c_fr, c_es) THEN 'en'
         |       WHEN c_de = greatest(c_en, c_de, c_fr, c_es) THEN 'de'
         |       WHEN c_fr = greatest(c_en, c_de, c_fr, c_es) THEN 'fr'
         |       ELSE 'es' END AS lang_pred
         |FROM s""".stripMargin)
}
