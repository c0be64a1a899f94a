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

  test("registeredDomainPsl: the canonical publicsuffix.org " +
      "checkPublicSuffix vector (table-driven)") {
    // The list maintainers' own test vector (publicsuffix.org/list —
    // the public-domain `tests/test_psl.txt` shipped alongside the
    // .dat; VERDICT r12 #3), mapped onto this engine's contract:
    //  - the upstream harness returns NULL when the host has no
    //    registrable domain (single label, host IS a public suffix,
    //    leading dot / empty label). Our fail-soft contract returns the
    //    host AS-IS there (curation filters on the output being a
    //    proper sub-domain), so `None` below asserts result == input.
    //  - upstream lowercases input before checking; we lowercase
    //    internally, so mixed-case rows assert the lowercased answer —
    //    except None rows, where as-is preserves the original case.
    //  - upstream's punycoded IDN rows pass because Psl.parse stores
    //    the IDN.toASCII twin of every Unicode rule (ADVICE r12).
    // Deliberate omission: the upstream null-input row (null → null is
    // covered by the null-propagation test below).
    val vector: Seq[(String, Option[String])] = Seq(
      // mixed case
      "COM" -> None,
      "example.COM" -> Some("example.com"),
      "WwW.example.COM" -> Some("example.com"),
      // leading dot
      ".com" -> None,
      ".example" -> None,
      ".example.com" -> None,
      ".example.example" -> None,
      // unlisted TLD (the implicit * rule)
      "example" -> None,
      "example.example" -> Some("example.example"),
      "b.example.example" -> Some("example.example"),
      "a.b.example.example" -> Some("example.example"),
      // TLD with only one rule
      "biz" -> None,
      "domain.biz" -> Some("domain.biz"),
      "b.domain.biz" -> Some("domain.biz"),
      "a.b.domain.biz" -> Some("domain.biz"),
      // TLD with some two-level rules
      "com" -> None,
      "example.com" -> Some("example.com"),
      "b.example.com" -> Some("example.com"),
      "a.b.example.com" -> Some("example.com"),
      "uk.com" -> None,
      "example.uk.com" -> Some("example.uk.com"),
      "b.example.uk.com" -> Some("example.uk.com"),
      "a.b.example.uk.com" -> Some("example.uk.com"),
      "test.ac" -> Some("test.ac"),
      // TLD with only one wildcard rule
      "mm" -> None,
      "c.mm" -> None,
      "b.c.mm" -> Some("b.c.mm"),
      "a.b.c.mm" -> Some("b.c.mm"),
      // more complex TLD (jp: prefectures + *.kobe.jp + !city.kobe.jp)
      "jp" -> None,
      "test.jp" -> Some("test.jp"),
      "www.test.jp" -> Some("test.jp"),
      "ac.jp" -> None,
      "test.ac.jp" -> Some("test.ac.jp"),
      "www.test.ac.jp" -> Some("test.ac.jp"),
      "kyoto.jp" -> None,
      "test.kyoto.jp" -> Some("test.kyoto.jp"),
      "ide.kyoto.jp" -> None,
      "b.ide.kyoto.jp" -> Some("b.ide.kyoto.jp"),
      "a.b.ide.kyoto.jp" -> Some("b.ide.kyoto.jp"),
      "c.kobe.jp" -> None,
      "b.c.kobe.jp" -> Some("b.c.kobe.jp"),
      "a.b.c.kobe.jp" -> Some("b.c.kobe.jp"),
      "city.kobe.jp" -> Some("city.kobe.jp"),
      "www.city.kobe.jp" -> Some("city.kobe.jp"),
      // TLD with a wildcard rule and exceptions
      "ck" -> None,
      "test.ck" -> None,
      "b.test.ck" -> Some("b.test.ck"),
      "a.b.test.ck" -> Some("b.test.ck"),
      "www.ck" -> Some("www.ck"),
      "www.www.ck" -> Some("www.ck"),
      // US K12
      "us" -> None,
      "test.us" -> Some("test.us"),
      "www.test.us" -> Some("test.us"),
      "ak.us" -> None,
      "test.ak.us" -> Some("test.ak.us"),
      "www.test.ak.us" -> Some("test.ak.us"),
      "k12.ak.us" -> None,
      "test.k12.ak.us" -> Some("test.k12.ak.us"),
      "www.test.k12.ak.us" -> Some("test.k12.ak.us"),
      // IDN labels (rules stored in Unicode in the .dat)
      "食狮.com.cn" -> Some("食狮.com.cn"),
      "食狮.公司.cn" -> Some("食狮.公司.cn"),
      "www.食狮.公司.cn" -> Some("食狮.公司.cn"),
      "shishi.公司.cn" -> Some("shishi.公司.cn"),
      "公司.cn" -> None,
      "食狮.中国" -> Some("食狮.中国"),
      "www.食狮.中国" -> Some("食狮.中国"),
      "shishi.中国" -> Some("shishi.中国"),
      "中国" -> None,
      // the same rows punycoded (the post-URL host form — ADVICE r12)
      "xn--85x722f.com.cn" -> Some("xn--85x722f.com.cn"),
      "xn--85x722f.xn--55qx5d.cn" -> Some("xn--85x722f.xn--55qx5d.cn"),
      "www.xn--85x722f.xn--55qx5d.cn" -> Some("xn--85x722f.xn--55qx5d.cn"),
      "shishi.xn--55qx5d.cn" -> Some("shishi.xn--55qx5d.cn"),
      "xn--55qx5d.cn" -> None,
      "xn--85x722f.xn--fiqs8s" -> Some("xn--85x722f.xn--fiqs8s"),
      "www.xn--85x722f.xn--fiqs8s" -> Some("xn--85x722f.xn--fiqs8s"),
      "shishi.xn--fiqs8s" -> Some("shishi.xn--fiqs8s"),
      "xn--fiqs8s" -> None)
    // one Spark job for the whole vector, row order preserved by index
    val got = vector.map(_._1).zipWithIndex.toDF("h", "i")
      .select(col("i"), Web.registeredDomainPsl(col("h")).as("d"))
      .orderBy("i").as[(Int, String)].collect().map(_._2)
    val failures = vector.zip(got).collect {
      case ((host, expected), actual)
          if actual != expected.getOrElse(host) =>
        s"$host -> $actual (expected ${expected.getOrElse(host + " as-is")})"
    }
    assert(failures.isEmpty, failures.mkString("; "))
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
