package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL / domain curation — the web-corpus hygiene pass every large-scale
  * training pipeline runs before anything content-based (C4, RefinedWeb,
  * Gopher and Dolma all gate on URL structure first, because it is the
  * only signal that costs zero text processing).
  *
  * Four primitives, all engine-replayable:
  *
  *  - [[canonicalize]]: normalize a URL to its canonical form so that
  *    byte-different spellings of the same resource collapse for exact
  *    dedup (lowercased scheme/host, default port stripped, fragment
  *    dropped, tracking params removed, surviving params sorted,
  *    trailing slash trimmed). Pure codegen'd string expressions —
  *    map-side, no shuffle, no UDF.
  *  - [[registeredDomain]]: the eTLD+1 grouping key for per-site caps
  *    and blocklists, against a documented built-in multi-part-suffix
  *    subset ([[MultiPartSuffixes]] — NOT the full public-suffix list;
  *    the rule set is the contract, spliced verbatim into the DuckDB
  *    oracle).
  *  - [[capPerDomain]]: keep the best `k` documents per domain — the
  *    anti-spam cap. Two-phase and skew-proof: a salted pre-cut bounds
  *    every (domain, salt) group to `k` rows, so the final per-domain
  *    window never sees more than `salts·k` rows even when one domain
  *    owns half the corpus (the single-window plan would converge that
  *    domain's entire row set onto one task — the exact shape
  *    `Selection` exists to avoid).
  *  - [[blocklistFilter]] / [[blocklistFilterDf]]: domain denylist as a
  *    map-side literal IN for small lists, or a broadcast anti-join for
  *    a list that lives in a table.
  *
  * The reference engine carries no URL machinery (its corpus keys are
  * opaque ids); this family is part of the training-data-pipeline brief.
  */
object UrlOps {

  /** Query parameters dropped by [[canonicalize]] — the common tracking
    * params (anchored regex over `name=`). ONE definition, spliced into
    * the oracle SQL. */
  val TrackingParamPattern: String =
    "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref|igshid)="

  /** Multi-part public suffixes recognized by [[registeredDomain]] — a
    * bounded BUILT-IN snapshot of the common two-label entries of the
    * ICANN public-suffix list (the `{com,net,org,gov,edu,…}.cc` second-
    * level registries of the major ccTLDs). The operator's contract is
    * "eTLD+1 against THIS list", not "the live PSL" (a mutable external
    * resource that would make results time-dependent); the list is the
    * artifact, spliced verbatim into the DuckDB oracle. Sorted, distinct,
    * all two-label (the three-label long tail — `pref.aichi.jp` and the
    * wildcard rules — is out of contract by documentation, not by
    * accident). */
  val MultiPartSuffixes: Seq[String] = Seq(
    // uk
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "org.uk",
    "plc.uk", "sch.uk",
    // au
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    // jp
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    // br
    "com.br", "edu.br", "gov.br", "net.br", "org.br",
    // nz
    "ac.nz", "co.nz", "govt.nz", "net.nz", "org.nz", "school.nz",
    // in
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "net.in", "org.in", "res.in",
    // cn
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "net.cn", "org.cn",
    // kr
    "ac.kr", "co.kr", "go.kr", "ne.kr", "or.kr", "pe.kr", "re.kr",
    // tw / hk / sg / my / id / ph / vn
    "com.tw", "edu.tw", "gov.tw", "idv.tw", "net.tw", "org.tw",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg",
    "com.my", "edu.my", "gov.my", "net.my", "org.my",
    "ac.id", "co.id", "go.id", "net.id", "or.id", "sch.id", "web.id",
    "com.ph", "edu.ph", "gov.ph", "net.ph", "org.ph",
    "com.vn", "edu.vn", "gov.vn", "net.vn", "org.vn",
    // za / il / tr / ua / mx / ar
    "ac.za", "co.za", "gov.za", "net.za", "org.za", "web.za",
    "ac.il", "co.il", "gov.il", "muni.il", "net.il", "org.il",
    "av.tr", "com.tr", "edu.tr", "gov.tr", "net.tr", "org.tr",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "net.ar", "org.ar",
    // assorted high-traffic LATAM / MEA second-level registries
    "com.bd", "com.bo", "com.co", "com.do", "com.ec", "com.eg",
    "com.gt", "com.ng", "com.pe", "com.pk", "com.py", "com.sa",
    "com.uy", "com.ve").sorted

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostportRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  /** Lowercased host (port stripped) of a raw URL. */
  def host(url: Column): Column = {
    val nf = regexp_replace(url, "#.*$", "")
    lower(regexp_replace(
      regexp_extract(nf, HostportRe, 1), ":[0-9]+$", ""))
  }

  /** Canonical form of `url` (see object doc for the rule set). Rows
    * that are not `scheme://...`-shaped come out as a bare "://"-joined
    * skeleton of empty parts — callers wanting to reject them filter on
    * `host(url) =!= ""` first (kept composable rather than raising:
    * a corpus-scale map stage must not abort on one malformed row). */
  def canonicalize(url: Column): Column = {
    val nf = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(nf, SchemeRe, 1))
    val hostport = regexp_extract(nf, HostportRe, 1)
    val hst = lower(regexp_replace(hostport, ":[0-9]+$", ""))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val portPart = when(
      port === "" ||
        (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"),
      lit("")).otherwise(concat(lit(":"), port))
    val stripped = regexp_replace(regexp_extract(nf, PathRe, 1), "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    val qs = regexp_extract(nf, "\\?([^#]*)", 1)
    val params = filter(split(qs, "&"),
      p => p =!= "" && !p.rlike(TrackingParamPattern))
    val cq = coalesce(array_join(array_sort(params), "&"), lit(""))
    concat(scheme, lit("://"), hst, portPart, path,
      when(cq === "", lit("")).otherwise(concat(lit("?"), cq)))
  }

  /** Anchored IPv4-literal host shape ([[registeredDomain]] guard) —
    * shared verbatim with the oracle. */
  val Ipv4HostPattern = "^[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}$"

  /** eTLD+1 of a (already lowercased) host against [[MultiPartSuffixes]]:
    * last 3 labels when the last 2 form a listed multi-part suffix, else
    * last 2, else the host itself (single-label hosts pass through).
    * IPv4-literal hosts pass through whole — an IP has no registrar
    * hierarchy, and taking its "last two labels" would collapse every
    * `x.y.0.1` address onto the meaningless domain "0.1". */
  def registeredDomain(hostCol: Column): Column = {
    val ls = split(hostCol, "\\.")
    val n = size(ls)
    val last2 = array_join(slice(ls, -2, 2), ".")
    val last3 = array_join(slice(ls, -3, 3), ".")
    when(hostCol.rlike(Ipv4HostPattern), hostCol)
      .when(n >= 3 && last2.isin(MultiPartSuffixes: _*), last3)
      .when(n >= 2, last2)
      .otherwise(hostCol)
  }

  /** Keep the `k` best rows per domain, "best" = (`orderCol` DESC,
    * `tieCol` ASC) — deterministic under ties by contract (`tieCol`
    * must be unique per domain, like every selection tie-break in this
    * codebase).
    *
    * Scale shape: TWO windows, not one. The first partitions by
    * (domain, hash(tie) % salts) — groups are bounded by the salt
    * fan-out, so the heaviest domain splits across `salts` tasks — and
    * keeps `k` per salt. The second sees at most `salts·k` rows per
    * domain (collapsed to one task per domain, but now O(k), not
    * O(domain size)). At 100 TB with a half-the-corpus domain the
    * single-window plan is a straggler task holding billions of rows;
    * this one holds `salts·k`. */
  def capPerDomain(df: DataFrame, domainCol: String, orderCol: String,
      tieCol: String, k: Int, salts: Int = 16): DataFrame = {
    require(k > 0, s"capPerDomain needs k > 0, got $k")
    require(salts > 0, s"capPerDomain needs salts > 0, got $salts")
    val ord = Seq(col(orderCol).desc, col(tieCol).asc)
    val w1 = Window
      .partitionBy(col(domainCol), pmod(hash(col(tieCol)), lit(salts)))
      .orderBy(ord: _*)
    val w2 = Window.partitionBy(col(domainCol)).orderBy(ord: _*)
    df.withColumn("__cap_s", row_number().over(w1))
      .filter(col("__cap_s") <= k).drop("__cap_s")
      .withColumn("__cap_r", row_number().over(w2))
      .filter(col("__cap_r") <= k).drop("__cap_r")
  }

  /** Drop rows whose `domainCol` is in `blocked` — a literal IN
    * (map-side, codegen'd) for the in-code denylist case. */
  def blocklistFilter(df: DataFrame, domainCol: String,
      blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "blocklistFilter: empty blocklist — " +
      "a no-op filter is almost certainly a mis-wired pipeline stage")
    df.filter(!col(domainCol).isin(blocked: _*))
  }

  /** Denylist that lives in a table: broadcast LEFT ANTI join — the
    * blocklist ships to every executor once; the corpus never shuffles. */
  def blocklistFilterDf(df: DataFrame, domainCol: String,
      blockedDomains: DataFrame): DataFrame = {
    val bCol = blockedDomains.columns.head
    df.join(
      broadcast(blockedDomains.select(col(bCol).as(domainCol)).distinct()),
      Seq(domainCol), "left_anti")
  }
}
