package graft

import org.apache.spark.sql.functions._

import graft.operators.Web

/** URL canonicalization / registered-domain / domain-cap semantics on
  * adversarial fixtures; oracle parity over engine-synthesized URLs is
  * q167_url_canonical_domain_cap.
  */
class WebSpec extends SparkSpec {
  import spark.implicits._

  private def canonOne(s: String): String =
    Seq(s).toDF("url").select(Web.canonicalizeUrl(col("url")).as("c"))
      .as[String].head()

  private def domainOne(s: String): String =
    Seq(s).toDF("url")
      .select(Web.registeredDomain(Web.hostOf(Web.canonicalizeUrl(col("url"))))
        .as("d"))
      .as[String].head()

  test("canonicalizeUrl: case, www, default ports, tracking params, " +
      "param sort, fragment") {
    assert(canonOne("HTTP://WWW.Example.COM:80/Path/A?b=2&utm_source=x&a=1#frag")
      === "http://example.com/Path/A?a=1&b=2")
    assert(canonOne("https://Sub.Site.co.uk:443/") === "https://sub.site.co.uk/")
    // non-default port kept; path case preserved
    assert(canonOne("https://host.com:8443/CaseSensitive") ===
      "https://host.com:8443/CaseSensitive")
    // empty path -> '/'; fully-tracking query loses its '?'
    assert(canonOne("http://a.com?utm_campaign=x&fbclid=1&gclid=2") ===
      "http://a.com/")
    // a param merely CONTAINING 'utm_' mid-key is kept; bare flag w/o '='
    assert(canonOne("http://a.com/p?xutm_q=1&utm_x") === "http://a.com/p?xutm_q=1")
    // :80 on https is NOT default -> kept
    assert(canonOne("https://a.com:80/x") === "https://a.com:80/x")
  }

  test("registeredDomain: eTLD+1 with multi-part suffixes, subdomains, " +
      "and fail-soft degenerate hosts") {
    assert(domainOne("http://www.news.bbc.co.uk/story") === "bbc.co.uk")
    assert(domainOne("https://cdn.assets.example.com/x") === "example.com")
    assert(domainOne("http://example.com/") === "example.com")
    assert(domainOne("http://localhost:8080/x") === "localhost")
    // kept non-default port is not part of the domain
    assert(domainOne("https://deep.sub.site.org:9999/") === "site.org")
  }

  private def pslOne(host: String): String =
    Seq(host).toDF("h").select(Web.registeredDomainPsl(col("h")).as("d"))
      .as[String].head()

  test("registeredDomainPsl: real PSL rules — multi-part, wildcard, " +
      "exception, PRIVATE section, implicit *, fail-soft") {
    // exact multi-part suffixes (ICANN section)
    assert(pslOne("www.news.bbc.co.uk") === "bbc.co.uk")
    assert(pslOne("shop.example.com.au") === "example.com.au")
    assert(pslOne("a.b.example.co.jp") === "example.co.jp")
    // plain TLD
    assert(pslOne("cdn.assets.example.com") === "example.com")
    // PRIVATE section: *.github.io-class site boundaries
    assert(pslOne("project.user.github.io") === "user.github.io")
    // wildcard rule *.ck: one extra label is part of the suffix
    assert(pslOne("shop.stuff.example.ck") === "stuff.example.ck")
    // exception rule !www.ck prevails over *.ck
    assert(pslOne("anything.www.ck") === "www.ck")
    assert(pslOne("www.ck") === "www.ck")
    // implicit * rule: unknown TLD falls to last-two-labels
    assert(pslOne("a.b.notarealtld") === "b.notarealtld")
    // fail-soft: host IS a public suffix / single label / uppercase in
    assert(pslOne("co.uk") === "co.uk")
    assert(pslOne("localhost") === "localhost")
    assert(pslOne("WWW.Example.COM") === "example.com")
    // degenerate empty-label hosts return as-is, never throw
    assert(pslOne("a..b") === "a..b")
    assert(pslOne("a.b.") === "a.b.")
  }

  test("registeredDomainPsl agrees with the built-in registeredDomain " +
      "on every suffix the built-in list knows") {
    val hosts = Web.MultiPartTlds.map(t => s"sub.site.$t") ++
      Seq("x.example.com", "example.org", "deep.a.b.example.net")
    val df = hosts.toDF("h")
    val both = df.select(
      Web.registeredDomain(col("h")).as("builtin"),
      Web.registeredDomainPsl(col("h")).as("psl"))
    assert(both.where(col("builtin") =!= col("psl")).count() === 0L)
    // and the PSL path null-propagates
    assert(Seq[Option[String]](None).toDF("h")
      .select(Web.registeredDomainPsl(col("h"))).head().isNullAt(0))
  }

  test("domainCap: deterministic rank within domain, kept flag at the cap") {
    val df = Seq(
      ("a.com", 1L, 100L), ("a.com", 2L, 300L), ("a.com", 3L, 300L),
      ("a.com", 4L, 200L), ("b.org", 5L, 10L))
      .toDF("domain", "id", "quality")
    val got = Web.domainCap(df, "domain", maxPerDomain = 2,
        col("quality").desc, col("id").asc)
      .select("id", "domain_rank", "kept")
      .as[(Long, Long, Long)].collect().toSet
    // a.com order: id2 (300), id3 (300, id tie-break), id4 (200), id1 (100)
    assert(got === Set((2L, 1L, 1L), (3L, 2L, 1L), (4L, 3L, 0L),
      (1L, 4L, 0L), (5L, 1L, 1L)))
    intercept[IllegalArgumentException] {
      Web.domainCap(df, "domain", maxPerDomain = 0, col("id").asc)
    }
  }

  test("domainCapSalted: kept / rank <= cap verdicts identical to the " +
      "exact window on a skewed fixture; degenerate group bounded") {
    // skew profile: one domain carries 400 of 430 rows (the crawl shape
    // the salted pre-pass exists for), two healthy domains around it
    val rows =
      (1L to 400L).map(i => ("megasite.com", i, (i * 37) % 211)) ++
        (401L to 415L).map(i => ("a.com", i, (i * 37) % 211)) ++
        (416L to 430L).map(i => ("b.org", i, (i * 37) % 211))
    val df = rows.toDF("domain", "id", "quality")
    val cap = 8
    def keptView(out: org.apache.spark.sql.DataFrame) = out
      .where(col("kept") === 1L)
      .select("domain", "id", "domain_rank")
      .as[(String, Long, Long)].collect().toSet
    val exact = Web.domainCap(df, "domain", cap,
      col("quality").desc, col("id").asc)
    val salted = Web.domainCapSalted(df, "domain", cap, saltFactor = 32,
      col("quality").desc, col("id").asc)
    // every kept verdict AND its exact rank agree
    assert(keptView(salted) === keptView(exact))
    // the pre-pass bounded the audit margin: <= saltFactor·cap
    // survivors per domain reach the exact window
    val perDomain = salted.groupBy("domain").count()
      .as[(String, Long)].collect().toMap
    assert(perDomain("megasite.com") <= 32L * cap,
      s"degenerate domain not bounded: $perDomain")
    // survivors' sub-cap ranks are exact, so non-kept survivors rank
    // strictly above the cap
    assert(salted.where(col("kept") === 0L && col("domain_rank") <= cap)
      .count() === 0L)
  }
}
