package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass every published LLM data pipeline
  * runs before training (emails, URLs, IPs, phone numbers → typed
  * placeholder tokens).
  *
  * Regex portability contract: every pattern stays inside the common
  * subset of Java regex (Spark) and RE2 (DuckDB oracle) — character
  * classes, bounded repeats, `\b`, `\d`, `\s`; no lookaround, no
  * backreferences. Order is fixed (URL → EMAIL → IP → PHONE) because
  * redaction is sequential: URLs are cut before the phone pass so digit
  * runs inside paths can never be half-eaten by the phone regex.
  *
  * Scale shape: pure per-row narrow `regexp_replace` projections —
  * codegen'd, no shuffle, no UDF; a scrub over 100 TB is exactly one
  * scan + rewrite.
  */
object Scrub {

  val UrlRe   = "https?://[^\\s]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpRe    = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  // phones must contain at least one space/dash separator: a bare \d{8,}
  // run would false-positive on ids, padded keys, and digit-run tokens
  // (e.g. "Customer#000000042") that dominate machine-generated text
  val PhoneRe = "\\+?\\d[\\d()]*[\\s\\-][\\d\\s\\-()]{4,}\\d"

  /** Sequentially redact all four PII classes to placeholder tokens. */
  def redact(text: Column): Column = {
    val noUrl   = regexp_replace(text, UrlRe, "<URL>")
    val noEmail = regexp_replace(noUrl, EmailRe, "<EMAIL>")
    val noIp    = regexp_replace(noEmail, IpRe, "<IP>")
    regexp_replace(noIp, PhoneRe, "<PHONE>")
  }

  /** Per-class hit counts, each measured on the ORIGINAL text (counts are
    * audit metrics — they must not depend on redaction order).
    */
  def countOf(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** `df` plus `redacted` and per-class count columns for `textCol` —
    * the audit-friendly scrub: run, then aggregate the counts to decide
    * whether a source is worth keeping.
    */
  def scrub(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("redacted", redact(col(textCol)))
      .withColumn("n_urls", countOf(col(textCol), UrlRe))
      .withColumn("n_emails", countOf(col(textCol), EmailRe))
      .withColumn("n_ips", countOf(col(textCol), IpRe))
      .withColumn("n_phones", countOf(col(textCol), PhoneRe))
}
