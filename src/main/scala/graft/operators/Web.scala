package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Web-corpus curation primitives — URL canonicalization, registered-
  * domain extraction, and per-domain document caps: the CommonCrawl-
  * style source hygiene a training pipeline runs BEFORE text-level
  * dedup (the reference stores opaque ids only — `server/engine.py`
  * keys vectors by integer id — so this is the pipeline layer above it;
  * RefinedWeb, Penedo et al. 2023 §3.1 "URL filtering" and Gopher,
  * Rae et al. 2021 §A1 motivate both stages).
  *
  * Everything here is a pure per-row `Column` expression chain (codegen,
  * zero shuffles) except [[domainCap]], which is one window shuffle on
  * the domain key.
  */
object Web {

  /** Multi-part public suffixes the fixture-scale [[registeredDomain]]
    * recognizes. A production deployment swaps in the full Mozilla
    * Public Suffix List (one `isin` over ~9k literals, or a broadcast
    * join when the list outgrows the expression) — the SEAM is the
    * point; the algebra does not change.
    */
  val MultiPartTlds: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za")

  /** Canonical URL form for dedup keys — one deterministic rewrite both
    * engines can replay:
    *   - scheme and host lowercased; a leading `www.` stripped
    *   - default ports dropped (`:80` for http, `:443` for https);
    *     non-default ports kept
    *   - path kept byte-exact (case-SENSITIVE per RFC 3986); empty
    *     path becomes `/`
    *   - query params split on `&`, tracking params removed
    *     (`utm_*`, `gclid`, `fbclid`), the rest SORTED and rejoined;
    *     a fully-tracking query loses its `?`
    *   - fragment dropped
    * Non-URL input (no `scheme://`) degrades to `://` + cleaned tail
    * rather than raising — curation filters on [[registeredDomain]]
    * being non-empty, the fail-soft contract of a 100-TB dirty corpus.
    */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host0 = regexp_replace(hostport, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val rest = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val params = filter(split(query, "&"),
      p => !(p rlike "^(utm_[^=]*|gclid|fbclid)(=|$)") && p =!= lit(""))
    val q = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Registered domain (a.k.a. eTLD+1) of an already-canonical HOST —
    * the grouping key for per-site caps and leakage-safe splits. Uses
    * [[MultiPartTlds]] to take three labels where the suffix is
    * two-part (`bbc.co.uk`), two otherwise (`example.com`); a
    * single-label or empty host returns as-is (the fail-soft twin of
    * [[canonicalizeUrl]]).
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    when(n <= 1, host)
      .when(n >= 3 && last2.isin(MultiPartTlds: _*),
        concat_ws(".", element_at(labels, -3), last2))
      .otherwise(last2)
  }

  /** [[registeredDomain]] through the swap seam it documents: the full
    * Mozilla Public Suffix List ([[Psl.default]], the build-pinned
    * `public_suffix_list.dat` artifact) evaluated by the real PSL
    * algorithm — longest matching rule prevails, exception rules beat
    * everything, `*.`-wildcards match one extra label, unmatched hosts
    * fall to the implicit `*` rule (last label). Same fail-soft
    * contract: a host that IS a public suffix, a single label, or empty
    * returns as-is. One codegen expression, zero shuffles —
    * per-row cost is labels × log(11.5k rules).
    */
  def registeredDomainPsl(host: Column): Column =
    graft.functions.expressions.RegisteredDomainPsl.column(host, Psl.default)

  /** Host of a canonical URL (port already stripped by
    * [[canonicalizeUrl]] for default ports; a kept non-default port is
    * NOT part of the domain, so it is removed here).
    */
  def hostOf(canonUrl: Column): Column =
    regexp_replace(
      regexp_extract(canonUrl, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1),
      ":[0-9]+$", "")

  /** Per-domain document cap — at most `maxPerDomain` rows per
    * registered domain survive, in a DETERMINISTIC preference order
    * (`order`, which the caller must make total, e.g. quality DESC with
    * an id tie-break). Adds `domain_rank` (1-based) and `kept` (0/1) so
    * the decision is auditable (the q156 fate discipline) rather than
    * silently dropping rows.
    *
    * Scale shape: ONE shuffle + sort on the domain key. A degenerate
    * domain (a single host contributing 100M of 100 TB) makes one sort
    * group; the mitigation is the opt-in `saltFactor` pre-pass (the
    * [[Dedup]] maxGramFreq opt-in discipline): a local row_number over
    * (domain, salt) keeps <= cap rows per salt — <= saltFactor·cap
    * survivors per domain — before this exact window, so the hottest
    * sort group is bounded. Every kept / rank <= cap verdict is
    * PRESERVED (each true top-cap row ranks <= cap inside its own salt
    * bucket too); rows pruned by the pre-pass were already beyond the
    * cap within one salt bucket and are definitively not-kept — the
    * salted form returns only the surviving rows (capped audit margin),
    * where the unsalted form returns every input row. Not on by
    * default: the pre-pass doubles the plan for a skew profile most
    * corpora don't have.
    */
  def domainCap(df: DataFrame, domainCol: String, maxPerDomain: Int,
      order: Column*): DataFrame =
    domainCapImpl(df, domainCol, maxPerDomain, None, order)

  /** [[domainCap]] with the salted pre-pass wired — see the scale note
    * there. `saltFactor` ~ the worker count (32 locally) bounds the
    * degenerate domain's final sort group at saltFactor·cap rows.
    */
  def domainCapSalted(df: DataFrame, domainCol: String, maxPerDomain: Int,
      saltFactor: Int, order: Column*): DataFrame = {
    require(saltFactor >= 2,
      s"domainCapSalted: saltFactor $saltFactor must be >= 2")
    domainCapImpl(df, domainCol, maxPerDomain, Some(saltFactor), order)
  }

  private def domainCapImpl(df: DataFrame, domainCol: String,
      maxPerDomain: Int, saltFactor: Option[Int],
      order: Seq[Column]): DataFrame = {
    require(maxPerDomain >= 1,
      s"domainCap: maxPerDomain $maxPerDomain must be >= 1")
    require(order.nonEmpty, "domainCap: a deterministic order is required")
    val base = saltFactor match {
      case None => df
      case Some(f) =>
        // deterministic salt: a pure row function (whole-row hash), so
        // re-runs salt identically — which bucket a row lands in is
        // irrelevant to correctness, only that each bucket's local
        // top-cap covers the global top-cap. (NOT the .desc/.asc order
        // columns themselves: SortOrder is unevaluable inside hash().)
        val wPre = Window
          .partitionBy(col(domainCol),
            pmod(hash(df.columns.map(col).toSeq: _*), lit(f)))
          .orderBy(order: _*)
        df.withColumn("__pre_rank", row_number().over(wPre))
          .where(col("__pre_rank") <= maxPerDomain)
          .drop("__pre_rank")
    }
    val w = Window.partitionBy(col(domainCol)).orderBy(order: _*)
    base.withColumn("domain_rank", row_number().over(w).cast("long"))
      .withColumn("kept",
        when(col("domain_rank") <= maxPerDomain, 1L).otherwise(0L))
  }
}
