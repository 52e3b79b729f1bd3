package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.UrlOps

/** URL / domain curation ([[graft.operators.UrlOps]]) as driver
  * queries. The test corpus carries no URL column, so each query FIRST
  * synthesizes one deterministically from (source, lang, doc_id) — the
  * synthesis is ONE SQL string ([[SynthUrlSql]]) parsed by BOTH engines
  * (Spark `expr(...)` and the DuckDB oracle verbatim), so the inputs
  * cannot diverge; the operators under test then run on that column.
  * The synthesized population deliberately exercises every
  * canonicalization rule: uppercase scheme/host, default and
  * non-default ports, trailing slashes, tracking + unsorted query
  * params, fragments, and a multi-part public suffix. */
object UrlQueries {

  /** Deterministic URL synthesis — shared verbatim by both engines
    * (standard SQL subset: CASE/concat/%). */
  val SynthUrlSql: String =
    """concat(
      |  CASE WHEN doc_id % 3 = 0 THEN 'HTTP' ELSE 'https' END, '://',
      |  'www.', source,
      |  CASE WHEN doc_id % 4 = 0 THEN '.CO.UK' ELSE '.com' END,
      |  CASE WHEN doc_id % 5 = 0 THEN ':443'
      |       WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END,
      |  '/', lang, '/Doc-', doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
      |  CASE WHEN doc_id % 3 = 0
      |       THEN concat('?utm_source=feed&b=2&a=1&id=', doc_id % 7)
      |       WHEN doc_id % 3 = 1 THEN '?fbclid=xyz' ELSE '' END,
      |  CASE WHEN doc_id % 7 = 0 THEN '#Section-2' ELSE '' END)""".stripMargin

  private def withUrl(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").withColumn("url", expr(SynthUrlSql))

  private def withDomain(s: SparkSession, dir: String): DataFrame = {
    val u = withUrl(s, dir)
    u.withColumn("domain",
      UrlOps.registeredDomain(UrlOps.host(col("url"))))
  }

  /** Canonical URL + registered domain per document — the normalize
    * stage a URL-level exact dedup keys on. Map-side only. */
  /** Synthesis for [[urlDedupQ]]: MANY docs spell the SAME resource
    * differently — uppercase scheme/host, default port, trailing slash,
    * tracking params, fragments vary by doc_id while the resource key is
    * (source, doc_id % 50) — so canonicalization is what collapses them.
    * One SQL string for both engines, like [[SynthUrlSql]]. */
  private[queries] val SynthUrlDupSql: String =
    """concat(
      |  CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'https' END, '://',
      |  CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE 'www.' END, source, '.com',
      |  CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END,
      |  '/r/Doc-', doc_id % 50,
      |  CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
      |  CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed'
      |       WHEN doc_id % 3 = 1 THEN '?fbclid=x' ELSE '' END,
      |  CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END)""".stripMargin

  /** URL-grain exact dedup — the FIRST dedup every web pipeline runs
    * (same resource crawled many times under byte-different spellings):
    * canonicalize map-side, then one hash agg keyed on the canonical
    * form, keep-min id + copy census. */
  private def urlDedupQ(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"),
        UrlOps.canonicalize(expr(SynthUrlDupSql)).as("canon_url"))
    Dedup.exact(d, Seq("canon_url"), "doc_id")
  }

  private def canonQ(s: SparkSession, dir: String): DataFrame =
    withDomain(s, dir)
      .select(col("doc_id"),
        UrlOps.canonicalize(col("url")).as("canon_url"),
        col("domain"))

  /** Anti-spam per-domain cap: keep the 5 longest documents per
    * registered domain (tie: doc_id) — the skew-proof two-phase cut. */
  private def capQ(s: SparkSession, dir: String): DataFrame =
    UrlOps.capPerDomain(
        withDomain(s, dir).select("doc_id", "domain", "n_chars"),
        domainCol = "domain", orderCol = "n_chars", tieCol = "doc_id",
        k = 5)
      .select("doc_id", "domain")

  private val Blocked = Seq("src0.com", "src3.co.uk", "src7.com")

  /** Denylist filter + survivor census per domain. */
  private def blockQ(s: SparkSession, dir: String): DataFrame =
    UrlOps.blocklistFilter(withDomain(s, dir), "domain", Blocked)
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"))

  /** The round's new families composed in ONE oracle-replayed plan — the
    * step-zero web-curation chain every large corpus runs BEFORE content
    * models: domain blocklist → anti-spam per-domain cap (15 best by
    * n_chars) → paragraph-grain keep-first dedup → quality/token gates
    * over the CLEANED text → per-lang census. Every stage bites at
    * sf0.01 (500 → 475 blocked → 285 capped → texts shortened →
    * 214 gated, with EACH gate cutting docs the other keeps: quality
    * alone 223, tokens alone 216). One declarative plan: the URL stages
    * are map-side string kernels + two bounded windows, the paragraph
    * stage shuffles only (id, idx, hash, len), the gates fuse map-side —
    * the chain inherits each member's 100 TB story. */
  private def curateV4Q(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextAnalysis
    import graft.operators.Dedup
    val docs = withDomain(s, dir)
    val capped = UrlOps.capPerDomain(
      UrlOps.blocklistFilter(docs, "domain", Blocked)
        .select("doc_id", "lang", "source", "n_chars", "text", "domain"),
      "domain", "n_chars", "doc_id", k = 15)
    val para = capped
      .withColumn("text", expr(DedupQueries.SynthParaSql))
      .select("doc_id", "lang", "text")
    val cleaned = Dedup.dedupParagraphs(para, "doc_id", "text", "\n",
      minChars = 5)
    cleaned
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
      .withColumn("quality", round(TextAnalysis.qualityScore(col("text")), 6))
      .filter(col("quality") >= 0.55 && col("n_tokens") >= 60)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "url_canonicalize" -> (canonQ _),
    "url_domain_cap" -> (capQ _),
    "url_blocklist" -> (blockQ _),
    "url_dedup" -> (urlDedupQ _),
    "pipeline_curate_v4" -> (curateV4Q _))

  /** DuckDB mirror of [[UrlOps.canonicalize]] — the rule set spliced
    * from the same constants ([[UrlOps.TrackingParamPattern]],
    * [[UrlOps.MultiPartSuffixes]]) the engine compiles. */
  private val raw = s"SELECT doc_id, n_chars, $SynthUrlSql AS url FROM documents"

  private val hostExtract =
    "lower(regexp_replace(regexp_extract(regexp_replace(url, '#.*$', ''), " +
      "'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), ':[0-9]+$', ''))"

  private val suffixList = UrlOps.MultiPartSuffixes
    .map(sfx => s"'$sfx'").mkString(", ")

  private def domainSql(hostCol: String): String =
    s"""CASE WHEN regexp_matches($hostCol, '${UrlOps.Ipv4HostPattern}')
       |     THEN $hostCol
       |     WHEN len(string_split($hostCol, '.')) >= 3
       |       AND array_to_string(string_split($hostCol, '.')[len(string_split($hostCol, '.'))-1:], '.') IN ($suffixList)
       |     THEN array_to_string(string_split($hostCol, '.')[len(string_split($hostCol, '.'))-2:], '.')
       |     WHEN len(string_split($hostCol, '.')) >= 2
       |     THEN array_to_string(string_split($hostCol, '.')[len(string_split($hostCol, '.'))-1:], '.')
       |     ELSE $hostCol END""".stripMargin

  /** The canonicalization chain (u → p → c CTE bodies) over any raw
    * `(doc_id, ..., url)` source — ONE SQL spelling of the engine's rule
    * set, shared by the url_canonicalize and url_dedup oracles. */
  private def canonCtes(rawSql: String): String =
    s"""raw AS ($rawSql),
       |u AS (SELECT doc_id, regexp_replace(url, '#.*$$', '') AS nf FROM raw),
       |p AS (SELECT doc_id,
       |  lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |  lower(regexp_replace(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), ':[0-9]+$$', '')) AS host,
       |  regexp_extract(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), ':([0-9]+)$$', 1) AS port,
       |  regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
       |  regexp_extract(nf, '\\?([^#]*)', 1) AS qs
       | FROM u),
       |c AS (SELECT doc_id, scheme, host,
       |  CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
       |            OR (scheme = 'http' AND port = '80')
       |       THEN '' ELSE concat(':', port) END AS portpart,
       |  CASE WHEN regexp_replace(path, '/+$$', '') = '' THEN '/'
       |       ELSE regexp_replace(path, '/+$$', '') END AS cpath,
       |  coalesce(array_to_string(list_sort(list_filter(string_split(qs, '&'),
       |    q -> q <> '' AND NOT regexp_matches(q, '${UrlOps.TrackingParamPattern}'))), '&'), '') AS cq
       | FROM p),
       |canon AS (SELECT doc_id, host,
       |  concat(scheme, '://', host, portpart, cpath,
       |    CASE WHEN cq = '' THEN '' ELSE concat('?', cq) END) AS canon_url
       | FROM c)""".stripMargin

  private val canonMirror =
    s"""WITH ${canonCtes(raw)}
       |SELECT doc_id, canon_url, ${domainSql("host")} AS domain
       |FROM canon""".stripMargin

  private val domained =
    s"""WITH raw AS ($raw),
       |h AS (SELECT doc_id, n_chars, $hostExtract AS host FROM raw)
       |SELECT doc_id, n_chars, ${domainSql("host")} AS domain FROM h""".stripMargin

  /** The whole v4 chain replayed in SQL: the same host/domain spellings
    * as the url_* oracles, the same paragraph keep-first replay as
    * dedup_paragraphs, the same quality formula as text_quality — the
    * capped set synthesizes paragraphs AFTER the cap, exactly like the
    * engine. */
  private val curateV4Oracle: String = {
    val toksOf =
      s"""list_filter(string_split_regex(lower(text), '${graft.functions.TextHash.WsRegex}'), x -> x <> '')"""
    s"""WITH raw AS (SELECT doc_id, lang, source, n_chars, text, $SynthUrlSql AS url FROM documents),
       |h AS (SELECT *, $hostExtract AS host FROM raw),
       |dom AS (SELECT doc_id, lang, source, n_chars, text, ${domainSql("host")} AS domain FROM h),
       |blocked AS (SELECT * FROM dom
       |            WHERE domain NOT IN (${Blocked.map(b => s"'$b'").mkString(", ")})),
       |capped AS (SELECT * FROM
       |  (SELECT *, row_number() OVER (PARTITION BY domain
       |     ORDER BY n_chars DESC, doc_id ASC) AS rnk FROM blocked)
       |  WHERE rnk <= 15),
       |para0 AS (SELECT doc_id, lang, ${DedupQueries.SynthParaSql} AS text FROM capped),
       |s AS (SELECT doc_id, lang, string_split(text, chr(10)) AS paras FROM para0),
       |p AS (SELECT doc_id, i - 1 AS idx, paras[i] AS para
       |      FROM s, unnest(generate_series(1, len(paras))) AS t(i)),
       |r AS (SELECT doc_id, idx, para, len(para) >= 5 AS elig,
       |        CASE WHEN len(para) >= 5 THEN row_number() OVER
       |          (PARTITION BY (CASE WHEN len(para) >= 5 THEN para ELSE NULL END)
       |           ORDER BY doc_id, idx) ELSE 1 END AS rn FROM p),
       |k AS (SELECT doc_id, idx, para FROM r WHERE NOT elig OR rn = 1),
       |reb AS (SELECT s.doc_id, s.lang, coalesce(g.txt, '') AS text
       |        FROM s LEFT JOIN
       |          (SELECT doc_id, array_to_string(list(para ORDER BY idx), chr(10)) AS txt
       |           FROM k GROUP BY doc_id) g USING (doc_id)),
       |q AS (SELECT doc_id, lang, len($toksOf)::BIGINT AS n_tokens,
       |        len($toksOf)::DOUBLE AS n_tok, len(text)::DOUBLE AS n_char,
       |        (len(text) - len(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))::DOUBLE AS punct,
       |        len(list_filter($toksOf,
       |            x -> x IN ('the','a','and','of','to','in','is')))::DOUBLE AS stops
       |      FROM reb),
       |g2 AS (SELECT doc_id, lang, n_tokens,
       |        CASE WHEN n_tok IS NULL THEN NULL ELSE
       |          round(0.3 * (CASE WHEN n_tok > 0 THEN stops / n_tok ELSE 0 END)
       |              + 0.3 * (1 - (CASE WHEN n_char > 0 THEN punct / n_char ELSE 0 END))
       |              + 0.4 * least(n_tok / 100, 1.0), 6) END AS quality
       |      FROM q)
       |SELECT lang, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS sum_tokens
       |FROM g2 WHERE quality >= 0.55 AND n_tokens >= 60
       |GROUP BY lang""".stripMargin
  }

  def oracle: Map[String, String] = Map(
    "pipeline_curate_v4" -> curateV4Oracle,
    "url_dedup" ->
      s"""WITH ${canonCtes(s"SELECT doc_id, $SynthUrlDupSql AS url FROM documents")}
         |SELECT canon_url, min(doc_id) AS doc_id,
         |       count(*)::BIGINT AS n_copies
         |FROM canon GROUP BY canon_url""".stripMargin,
    "url_canonicalize" -> canonMirror,
    "url_domain_cap" ->
      s"""WITH d AS ($domained),
         |r AS (SELECT doc_id, domain,
         |        row_number() OVER (PARTITION BY domain
         |          ORDER BY n_chars DESC, doc_id ASC) AS rn
         |      FROM d)
         |SELECT doc_id, domain FROM r WHERE rn <= 5""".stripMargin,
    "url_blocklist" ->
      s"""WITH d AS ($domained)
         |SELECT domain, count(*)::BIGINT AS n_docs,
         |       sum(n_chars)::BIGINT AS sum_chars
         |FROM d
         |WHERE domain NOT IN (${Blocked.map(b => s"'$b'").mkString(", ")})
         |GROUP BY domain""".stripMargin)
}
