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

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "url_canonicalize" -> (canonQ _),
    "url_domain_cap" -> (capQ _),
    "url_blocklist" -> (blockQ _))

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
    s"""CASE WHEN len(string_split($hostCol, '.')) >= 3
       |       AND array_to_string(string_split($hostCol, '.')[len(string_split($hostCol, '.'))-1:], '.') IN ($suffixList)
       |     THEN array_to_string(string_split($hostCol, '.')[len(string_split($hostCol, '.'))-2:], '.')
       |     WHEN len(string_split($hostCol, '.')) >= 2
       |     THEN array_to_string(string_split($hostCol, '.')[len(string_split($hostCol, '.'))-1:], '.')
       |     ELSE $hostCol END""".stripMargin

  private val canonMirror =
    s"""WITH raw AS ($raw),
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
       | FROM p)
       |SELECT doc_id,
       |  concat(scheme, '://', host, portpart, cpath,
       |    CASE WHEN cq = '' THEN '' ELSE concat('?', cq) END) AS canon_url,
       |  ${domainSql("host")} AS domain
       |FROM c""".stripMargin

  private val domained =
    s"""WITH raw AS ($raw),
       |h AS (SELECT doc_id, n_chars, $hostExtract AS host FROM raw)
       |SELECT doc_id, n_chars, ${domainSql("host")} AS domain FROM h""".stripMargin

  def oracle: Map[String, String] = Map(
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
