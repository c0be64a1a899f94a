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

  /** Candidate payment-card sequences: 13–19 digits with optional
    * single space/dash separators (the PAN length range). A regex alone
    * over-redacts — invoice numbers, timestamps, ids — so detection is
    * two-stage: pattern match, then [[luhnValid]] checksum. Pattern
    * stays in the Java∩RE2 subset (no lookaround).
    */
  val CcRe = "\\b\\d(?:[ -]?\\d){12,18}\\b"

  /** Luhn checksum (ISO/IEC 7812) over a candidate string's digits, as a
    * pure Column expression — codegen'd array lambdas, no UDF: strip
    * separators, reverse, double every second digit (from the right,
    * 0-based odd positions), subtract 9 when doubling overflows, sum
    * mod 10 == 0. The decisive filter between a real PAN and an
    * arbitrary digit run (~10% of random runs pass — the industry
    * false-positive floor).
    */
  def luhnValid(s: Column): Column = {
    val digits = reverse(filter(split(s, ""), c => c.rlike("^[0-9]$")))
    val contrib = zip_with(digits,
      sequence(lit(0), greatest(size(digits) - 1, lit(0))),
      (c, i) => {
        val d = c.cast("int")
        when(i % 2 === 0, d)
          .otherwise(when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
      })
    size(digits) >= 13 &&
      aggregate(contrib, lit(0), (a, x) => a + x) % 10 === 0
  }

  /** Per-row card-number audit: candidate matches, how many validate,
    * and the text with VALID candidates redacted to `<CC>` (invalid
    * digit runs are left alone — redacting them would eat invoice ids).
    * Row-local, codegen, zero shuffle — the [[scrub]] contract.
    *
    * Redaction is POSITIONAL, not a text search for the candidate's
    * characters: `split(text, CcRe, -1)` yields the n+1 inter-match
    * segments in order, `regexp_extract_all` yields the n matches in the
    * same order (same engine, same left-to-right greedy scan), and the
    * rebuild interleaves them, swapping each candidate for `<CC>` iff it
    * Luhn-validates. A re-replace of the candidate's TEXT (even
    * \b-bounded) is wrong here: `\b` only guards digit-adjacent
    * embedding, so a valid PAN's digits sitting separator-adjacent
    * inside a LONGER run — whose own candidate was Luhn-invalid and must
    * be preserved — would still be rewritten (pinned in ScrubSpec).
    */
  def scrubCards(df: DataFrame, textCol: String): DataFrame = {
    // candidates, verdicts and segments are STAGED columns so the two
    // regex scans and the Luhn fold each run once per row (CollapseProject
    // keeps a non-cheap alias referenced more than once staged; the
    // inlined form re-ran extract_all per consumer — measured 2× slower)
    val staged = df
      .withColumn("__cands", regexp_extract_all(col(textCol), lit(CcRe), lit(0)))
      .withColumn("__luhn", transform(col("__cands"), c => luhnValid(c)))
      .withColumn("__segs", split(col(textCol), CcRe, -1))
    val rebuilt = concat(
      element_at(col("__segs"), 1),
      array_join(zip_with(
        zip_with(col("__cands"), col("__luhn"),
          (c, v) => when(v, lit("<CC>")).otherwise(c)),
        slice(col("__segs"), lit(2),
          greatest(size(col("__segs")) - 1, lit(0))),
        (r, seg) => concat(r, seg)), ""))
    staged
      .withColumn("n_cc_candidates", size(col("__cands")).cast("long"))
      .withColumn("n_cc_valid", size(filter(col("__luhn"), v => v)).cast("long"))
      .withColumn("cc_redacted",
        when(size(col("__cands")) === 0, col(textCol)).otherwise(rebuilt))
      .drop("__cands", "__luhn", "__segs")
  }
}
