package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class UrlOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(UrlOps.canonicalize(col("u"))).head().getString(0)

  test("canonicalize: every rule on explicit cases") {
    // lowercase scheme+host, default https port stripped, tracking params
    // dropped, survivors sorted, fragment dropped, trailing slash trimmed,
    // path case PRESERVED
    assert(canon("HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&b=2&a=1#frag")
      === "https://www.example.com/A/b?a=1&b=2")
    // default http port stripped; root path survives as /
    assert(canon("http://Host.com:80/") === "http://host.com/")
    // non-default port kept
    assert(canon("http://host.com:8080/x/") === "http://host.com:8080/x")
    // https on port 80 is NON-default — kept
    assert(canon("https://host.com:80/x") === "https://host.com:80/x")
    // empty path → /
    assert(canon("https://host.com") === "https://host.com/")
    // all params tracking → no query part at all
    assert(canon("https://host.com/?fbclid=z&gclid=1&igshid=a&ref=r&msclkid=m")
      === "https://host.com/")
    // empty query string → no dangling '?'
    assert(canon("https://host.com/a?") === "https://host.com/a")
  }

  test("registeredDomain: multi-part suffixes, bare hosts, deep subdomains") {
    val got = Seq("www.a.co.uk", "www.b.com", "localhost", "a.b.c.ac.uk",
        "example.com")
      .toDF("h").select(UrlOps.registeredDomain(col("h"))).as[String]
      .collect().toSeq
    assert(got === Seq("a.co.uk", "b.com", "localhost", "c.ac.uk",
      "example.com"))
  }

  test("registeredDomain: ICANN-subset long tail and IPv4 literals") {
    val got = Seq("foo.gov.uk", "x.com.au", "news.co.nz", "a.b.gob.mx",
        "shop.com.vn", "192.168.0.1", "10.0.0.1", "999.1.2.3",
        "go.jp" /* the bare suffix itself: passes through as last-2 */)
      .toDF("h").select(UrlOps.registeredDomain(col("h"))).as[String]
      .collect().toSeq
    assert(got === Seq("foo.gov.uk", "x.com.au", "news.co.nz", "b.gob.mx",
      "shop.com.vn", "192.168.0.1", "10.0.0.1", "999.1.2.3", "go.jp"))
    // the list is sorted+distinct by construction (the splice contract)
    assert(UrlOps.MultiPartSuffixes === UrlOps.MultiPartSuffixes.sorted)
    assert(UrlOps.MultiPartSuffixes.distinct === UrlOps.MultiPartSuffixes)
    assert(UrlOps.MultiPartSuffixes.forall(_.count(_ == '.') == 1))
  }

  test("capPerDomain: equals the single-window reference on a skewed table") {
    // one whale domain (200 rows), a boundary domain (exactly k), a small one
    val rows = (0 until 200).map(i => ("whale.com", i.toLong, (i % 37).toLong)) ++
      (0 until 5).map(i => ("exact.com", 1000L + i, 10L)) ++
      (0 until 2).map(i => ("tiny.com", 2000L + i, 5L))
    val df = rows.toDF("domain", "id", "quality")
    val got = UrlOps.capPerDomain(df, "domain", "quality", "id", k = 5,
        salts = 4)
      .select("domain", "id").as[(String, Long)].collect().toSet
    val w = Window.partitionBy("domain")
      .orderBy(col("quality").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("domain", "id").as[(String, Long)].collect().toSet
    assert(got === want)
    assert(got.count(_._1 == "whale.com") === 5)
    assert(got.count(_._1 == "exact.com") === 5)
    assert(got.count(_._1 == "tiny.com") === 2)
  }

  test("capPerDomain: deterministic under full quality ties (tieCol decides)") {
    val df = (0 until 40).map(i => ("d.com", i.toLong, 1L))
      .toDF("domain", "id", "quality")
    val got = UrlOps.capPerDomain(df, "domain", "quality", "id", k = 3)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === Seq(0L, 1L, 2L))
  }

  test("blocklistFilter drops listed domains only; empty list refuses") {
    val df = Seq(("a.com", 1L), ("b.com", 2L), ("c.com", 3L))
      .toDF("domain", "id")
    val kept = UrlOps.blocklistFilter(df, "domain", Seq("b.com"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 3L))
    val e = intercept[IllegalArgumentException](
      UrlOps.blocklistFilter(df, "domain", Nil))
    assert(e.getMessage.contains("empty blocklist"))
  }

  test("blocklistFilterDf: broadcast anti-join, corpus side never shuffles") {
    val df = Seq(("a.com", 1L), ("b.com", 2L), ("c.com", 3L))
      .toDF("domain", "id")
    val bl = Seq("b.com", "zz.com").toDF("blocked_domain")
    val out = UrlOps.blocklistFilterDf(df, "domain", bl)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join:\n$plan")
    assert(out.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
  }
}
