package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/** Text-analysis column functions for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, and document
  * fingerprinting. All are pure `Column` compositions of codegen'd built-ins
  * (no UDFs), so they stay inside whole-stage codegen and scale linearly
  * with a plain table scan — no shuffle, no driver round-trips.
  *
  * Every function uses only integer/rational arithmetic (or 6-decimal
  * rounding) so results are bit-identical across engines — each has a
  * matching DuckDB oracle in [[graft.queries.TextQueries]].
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped. The separator class is the
    * engine-portable explicit spelling ([[TextHash.WsRegex]]) — bare `\s`
    * differs between Java and RE2 on vertical tab, which would fail the
    * token oracles on any document containing one. */
  def tokens(text: Column): Column =
    filter(split(lower(text), TextHash.WsRegex), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumeric glyphs — the usual pre-tokenizer shape (GPT-2 style)
    * restricted to ASCII classes so any regex engine agrees. The glyph
    * class excludes ALL whitespace (explicit char set, not `\s` — Java
    * and RE2 disagree on vertical tab), not just the space character:
    * tabs and newlines are separators, and counting one token per
    * line-break would bias every multi-line document's count. */
  val BpeishPattern = s"[a-z]+|[0-9]+|[^a-z0-9${TextHash.WsClassChars}]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpeishPattern), lit(0)))

  /** Stopword lists per language (tiny, deterministic; ASCII only). */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "la", "los", "y", "es", "un"))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Stopword occurrences for one language's list. */
  def stopwordCount(text: Column, lang: String): Column =
    countIn(tokens(text), Stopwords.toMap.apply(lang))

  /** Language ID by stopword-count argmax; ties break by list order
    * (en > de > fr > es); zero hits everywhere → "und" (undetermined). */
  def languageId(text: Column): Column = {
    val toks = tokens(text)
    val scored = Stopwords.map { case (l, ws) => (l, countIn(toks, ws)) }
    val best = greatest(scored.map(_._2): _*)
    val pick = scored.foldRight(lit("und")) { case ((l, c), acc) =>
      when(c === best && best > 0, lit(l)).otherwise(acc)
    }
    // foldRight means earlier languages override later ones on ties
    pick
  }

  /** Quality score in [0,1]: rewards stopword presence (natural language),
    * penalizes punctuation, saturates on length. Linear/rational arithmetic
    * only; round at the call site. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val nChar = length(text).cast("double")
    val punct = nChar - length(regexp_replace(lower(text), "[^a-z0-9 ]", ""))
    val punctRatio = when(nChar > 0, punct / nChar).otherwise(lit(0d))
    val stops = countIn(toks, Stopwords.toMap.apply("en")).cast("double")
    val stopRatio = when(nTok > 0, stops / nTok).otherwise(lit(0d))
    val lenNorm = least(nTok / lit(100d), lit(1d))
    // NULL text must score NULL, not 0.7: `least` SKIPS nulls, so the null
    // lenNorm silently became 1.0 while the guarded terms fell to 0 — a
    // NULL document out-scored real noisy ones and passed quality gates
    when(text.isNull, lit(null).cast("double")).otherwise(
      lit(0.3) * stopRatio + lit(0.3) * (lit(1d) - punctRatio) + lit(0.4) * lenNorm)
  }

  /** PII scrubbing: redact emails and phone-like numbers. ASCII-safe
    * patterns shared verbatim with the DuckDB oracle (RE2 and Java regex
    * agree on these constructs). */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9-]{7,}[0-9]"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(lower(text), EmailPattern, "[EMAIL]"),
      PhonePattern, "[PHONE]")

  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(lower(text), lit(pattern), lit(0)))

  /** TOKEN-BOUNDARY phrase blocklist hit (the C4 "bad words" page
    * filter): true when any of `phrases` occurs as a run of consecutive
    * whitespace tokens — "slow scan" matches "a slow scan here", never
    * "slowscan" or "slow scanning" ("scanning" is a different token).
    * Spelled as ONE normalized-token-string rebuild (space-joined,
    * space-padded) plus one codegen'd `contains` per phrase — map-side,
    * no explode, no shuffle; a 400-entry list (C4's is ~400) is 400
    * substring probes over an already-normalized string per row. Phrases
    * normalize at build time (lowercase, whitespace collapsed); empty
    * phrases refuse. */
  def containsAnyPhrase(text: Column, phrases: Seq[String]): Column = {
    require(phrases.nonEmpty, "containsAnyPhrase: empty phrase list — " +
      "a no-op filter is almost certainly a mis-wired pipeline stage")
    val norm = phrases.map(_.trim.toLowerCase.split("\\s+").mkString(" "))
    require(norm.forall(_.nonEmpty), "containsAnyPhrase: blank phrase")
    // ONE codegen'd kernel walk, not concat(array_join(tokens(...))) —
    // the HOF lambdas in `tokens` are CodegenFallback and evicted the
    // whole gate stage from whole-stage codegen (both dispatch paths);
    // byte-equality with the HOF spelling is pinned by
    // PhraseSetMatchParitySpec
    val joined = PaddedTokensExpr(text)
    if (norm.length > PhraseOrTreeMax)
      // ONE Aho–Corasick pass, O(len) per row independent of list size —
      // the or-tree's per-row cost is O(N·len) and its analysis cost
      // grows with the expression tree (PhraseSetMatch scaladoc);
      // equality pinned by PhraseSetMatchParitySpec
      PhraseSetMatchExpr(joined, norm.map(p => s" $p "))
    else {
      // BALANCED or-tree, not reduce(_ || _): a linear 400-deep Or chain
      // overflows Catalyst's recursive analysis stack (measured at the
      // 525k rehearsal); log-depth keeps any in-range list analyzable
      def orAll(cs: Seq[Column]): Column =
        if (cs.length == 1) cs.head
        else orAll(cs.grouped(2)
          .map(g => if (g.length == 2) g(0) || g(1) else g(0)).toSeq)
      orAll(norm.map(p => joined.contains(s" $p ")))
    }
  }

  /** Above this many phrases [[containsAnyPhrase]] dispatches to the
    * Aho–Corasick kernel; below it, codegen'd contains-probes win (the
    * automaton's per-row virtual call + String materialization only
    * amortizes once the probe count is substantial). */
  val PhraseOrTreeMax = 64

  /** Card-number candidates: 13–19 digits, single space/dash separators
    * allowed (the common spacings). RE2/Java-common dialect; shared
    * verbatim with the oracle. */
  val CardCandidatePattern = "[0-9](?:[ -]?[0-9]){12,18}"

  /** Luhn checksum validity of a digit-only string — the check that
    * separates card numbers from arbitrary digit runs (redacting every
    * 16-digit run would eat order ids and timestamps). Exact integer
    * HOF fold, replayed digit-for-digit by the DuckDB oracle. */
  def luhnValid(digits: Column): Column = {
    val n = length(digits)
    val total = aggregate(sequence(lit(1), n), lit(0), (acc, i) => {
      val d0 = digits.substr(i, lit(1)).cast("int")
      val dbl = d0 * 2
      acc + when(pmod(n - i, lit(2)) === 1,
        when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(d0)
    })
    n >= 1 && pmod(total, lit(10)) === 0
  }

  /** The Luhn-valid card numbers in `text`, sorted (deterministic
    * replace order for [[redactCards]]). */
  def validCards(text: Column): Column =
    array_sort(filter(
      regexp_extract_all(text, lit(CardCandidatePattern), lit(0)),
      c => luhnValid(regexp_replace(c, "[ -]", ""))))

  /** Replace every Luhn-VALID card candidate with `[CARD]`; invalid
    * digit runs pass through untouched (the false-positive control a
    * bare regex redaction lacks). Map-side fold over the per-row valid
    * list — no explode, no shuffle. */
  def redactCards(text: Column): Column =
    aggregate(validCards(text), text,
      (t, c) => replace(t, c, lit("[CARD]")))

  /** Secret-key candidates: 24+ chars of the token alphabet. A bare
    * length cut would eat long words and long numbers — validity below
    * requires BOTH a digit and a letter (the API-key shape). */
  val SecretCandidatePattern = "[A-Za-z0-9_-]{24,}"

  /** The mixed-class (letter AND digit) long tokens in `text`, sorted. */
  def validSecrets(text: Column): Column =
    array_sort(filter(
      regexp_extract_all(text, lit(SecretCandidatePattern), lit(0)),
      c => c.rlike("[0-9]") && c.rlike("[A-Za-z]")))

  /** Replace mixed-class long tokens with `[SECRET]`; long pure-letter
    * words and long pure-digit runs survive (the false-positive
    * controls). Same fold shape as [[redactCards]]. */
  def redactSecrets(text: Column): Column =
    aggregate(validSecrets(text), text,
      (t, c) => replace(t, c, lit("[SECRET]")))

  /** IPv4-shaped runs → `[IP]` (the standard scrubber approximation —
    * no octet-range check; shared verbatim with the oracle). */
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  def redactIps(text: Column): Column =
    regexp_replace(text, Ipv4Pattern, "[IP]")

  // ------- Gopher-style repetition & quality signals (Rae et al. 2021, §A1)

  /** ALL word n-grams (space-joined, non-distinct) — the frequency-counting
    * sibling of `Dedup.shingles`, which dedupes for set semantics. Empty
    * array below n tokens (guards Spark's descending `sequence`). Also the
    * executable HOF spec of [[GramStats]]'s gram enumeration —
    * TextAnalysisSpec derives the kernel's (top_cover, dup_occ, n_grams)
    * from this column and asserts equality. */
  def allWordGrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val k = size(toks) - (n - 1)
    when(k <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), k),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Mean word length (rational; round at the call site); 0 for empty docs. */
  def meanWordLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0d)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks))
  }

  /** Fraction of words containing at least one letter. */
  def alphaWordFraction(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0d)).otherwise(
      size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / size(toks))
  }

  /** Hash/ellipsis symbols per word (Gopher's symbol-to-word ratio). */
  val SymbolPattern = "#|\\.\\.\\."
  def symbolWordRatio(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0d))
      .otherwise(countMatches(text, SymbolPattern).cast("double") / n)
  }

  /** Fraction of word occurrences that repeat an already-seen word —
    * `array_distinct` keeps this a single codegen'd pass, no per-token
    * quadratic HOF. */
  def dupWordFraction(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0d)).otherwise(
      (size(toks) - size(array_distinct(toks))).cast("double") / size(toks))
  }

  /** Gopher-rule thresholds (defaults from the paper where the signal
    * exists in this corpus shape). */
  final case class GopherThresholds(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3d,
      maxMeanWordLen: Double = 10d,
      maxSymbolWordRatio: Double = 0.1,
      minAlphaWordFrac: Double = 0.8,
      minStopwordHits: Int = 2)

  /** The conjunctive Gopher quality gate as one boolean column. All
    * comparisons are on exact integer counts or single integer-ratio
    * divisions, so both engines decide boundaries identically.
    *
    * Shape matters: the gate's natural home is a Filter predicate, where
    * Spark does NOT do common-subexpression elimination — a spelling that
    * names each signal column ([[tokenCount]] + [[meanWordLength]] + …)
    * re-tokenizes the document ~7 times per row. Here the token-derived
    * counts (n, total length, alpha words, stopword hits) accumulate in
    * ONE `aggregate` over a single [[tokens]] pass whose finish lambda
    * emits the final boolean, plus one regex pass for the symbol count —
    * two traversals of the text total. Decision-identical to the named
    * signals (TextAnalysisSpec asserts the equivalence): every per-signal
    * zero-token guard collapses to `false` exactly when `n >= minWords`
    * already fails, and NaN/∞ from a 0-token division compare false. */
  def gopherGate(text: Column,
      t: GopherThresholds = GopherThresholds()): Column = {
    val en = Stopwords.toMap.apply("en")
    val zero = struct(
      lit(0L).as("n"), lit(0L).as("len"), lit(0L).as("alpha"), lit(0L).as("stops"))
    val symbols = countMatches(text, SymbolPattern)
    aggregate(
      tokens(text),
      zero,
      (acc, tok) => struct(
        (acc.getField("n") + 1L).as("n"),
        (acc.getField("len") + length(tok)).as("len"),
        (acc.getField("alpha") + when(tok.rlike("[a-z]"), 1L).otherwise(0L)).as("alpha"),
        (acc.getField("stops") + when(tok.isin(en.map(lit): _*), 1L).otherwise(0L)).as("stops")),
      acc => {
        val n = acc.getField("n")
        val nD = n.cast("double")
        val meanLen = acc.getField("len").cast("double") / nD
        n >= t.minWords && n <= t.maxWords &&
          meanLen >= t.minMeanWordLen && meanLen <= t.maxMeanWordLen &&
          symbols.cast("double") / nD <= t.maxSymbolWordRatio &&
          acc.getField("alpha").cast("double") / nD >= t.minAlphaWordFrac &&
          acc.getField("stops") >= t.minStopwordHits
      })
  }

  /** Polynomial rolling-hash fingerprint over the character codepoints:
    * `h = (h*31 + code) mod 1e9+7`. Stable across engines (integer math),
    * usable as a cheap content key for shard-local dedup or bucketing.
    * Implemented as the codegen'd [[PolyHash]] expression (the interpreted
    * HOF spelling was ~50× slower at sf0.1). */
  val FingerprintMod: Long = TextHash.Mod
  def fingerprint(text: Column): Column = PolyHash(text, 31L)

  /** Shannon entropy of the token distribution (nats) — the classic
    * low-diversity/repetition signal (a keyword-stuffed or template page
    * has far lower entropy than prose of the same length). Per-doc
    * map-side kernel: counts in a TreeMap, the `−p·ln p` terms folded in
    * SORTED-token order so the DuckDB oracle (`list(term ORDER BY w)` +
    * `list_reduce`) replays the addends bit-for-bit. Zero-token docs
    * score 0. */
  def tokenEntropy(s: org.apache.spark.unsafe.types.UTF8String): Double = {
    val toks = TextHash.tokenize(s)
    if (toks.isEmpty) return 0.0
    val m = new java.util.TreeMap[String, Long]()
    toks.foreach(t => m.merge(t, 1L, (a, b) => a + b))
    val n = toks.length.toDouble
    var acc = 0.0
    val it = m.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      acc += -(p * math.log(p))
    }
    acc
  }

  def tokenEntropy(text: Column): Column =
    Bridge.column(TokenEntropyExpr(Bridge.expression(text)))
}

/** Codegen'd [[TextAnalysis.tokenEntropy]]. */
case class TokenEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_entropy requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "token_entropy"

  override protected def nullSafeEval(s: Any): Any =
    TextAnalysis.tokenEntropy(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextAnalysis.tokenEntropy($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
