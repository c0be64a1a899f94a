package graft

import org.apache.spark.sql.functions._

import graft.operators.Scrub

/** PII redaction semantics on adversarial fixtures; oracle parity over
  * engine-synthesized dirty text is q53_pii_scrub.
  */
class ScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(s: String): (String, Long, Long, Long, Long) =
    Scrub.scrub(Seq(s).toDF("text"), "text")
      .select("redacted", "n_urls", "n_emails", "n_ips", "n_phones")
      .as[(String, Long, Long, Long, Long)].head()

  test("each class redacts to its token") {
    assert(scrubOne("mail a.b+c@ex-site.org now") ===
      (("mail <EMAIL> now", 0L, 1L, 0L, 0L)))
    assert(scrubOne("see https://a.b/c?d=1 and http://x.y") ===
      (("see <URL> and <URL>", 2L, 0L, 0L, 0L)))
    assert(scrubOne("host 192.168.0.1 up") ===
      (("host <IP> up", 0L, 0L, 1L, 0L)))
    assert(scrubOne("call +1 (555) 123-4567 now") ===
      (("call <PHONE> now", 0L, 0L, 0L, 1L)))
  }

  test("URL containing an email-like or digit-run path is ONE url") {
    val (red, urls, emails, _, phones) =
      scrubOne("go https://x.com/a@b.cd/12345678 end")
    assert(red === "go <URL> end")
    assert(urls === 1L)
    // counts run on the ORIGINAL text: the @-path trips the email counter
    // (audit counts are per-class upper bounds, not exclusive) — but the
    // separator rule keeps the bare digit run out of the phone count, and
    // redaction order guarantees the REDACTED text cut it as ONE url
    assert(emails === 1L)
    assert(phones === 0L)
  }

  test("digit runs without separators are not phones; separated runs are") {
    assert(scrubOne("order 12345 of 150000")._5 === 0L)
    assert(scrubOne("id 000012345678 padded")._5 === 0L)
    assert(scrubOne("fax 555-123-4567 ok")._5 === 1L)
  }

  test("clean text passes through untouched") {
    val s = "the quick brown fox 42 jumps"
    assert(scrubOne(s) === ((s, 0L, 0L, 0L, 0L)))
  }

  test("luhnValid: known-good PANs pass, off-by-one checksums and short " +
      "runs fail; scrubCards redacts only validated candidates") {
    val rows = Seq(
      (1L, "pay 4539 1488 0343 6467 now"),   // valid (Luhn test number)
      (2L, "pay 4539 1488 0343 6468 now"),   // checksum off by one
      (3L, "ref 1234 5678 too short"),       // below 13 digits: no candidate
      (4L, "card 4111111111111111 ok"),      // classic valid test Visa
      (5L, "invoice 2026081412345678 x"))    // 16-digit id, fails Luhn
      .toDF("id", "text")
    val got = graft.operators.Scrub.scrubCards(rows, "text")
      .select("id", "n_cc_candidates", "n_cc_valid", "cc_redacted")
      .orderBy("id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got(0) === ((1L, 1L, 1L, "pay <CC> now")))
    assert(got(1) === ((2L, 1L, 0L, "pay 4539 1488 0343 6468 now")))
    assert(got(2)._2 === 0L && got(2)._4 === "ref 1234 5678 too short")
    assert(got(3) === ((4L, 1L, 1L, "card <CC> ok")))
    assert(got(4)._3 === 0L, "random 16-digit ids must not redact")
    // still a pure row-local projection
    val plan = graft.operators.Scrub.scrubCards(rows, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("scrubCards redacts positionally: the same digits embedded in a " +
      "longer non-candidate run are left intact") {
    // "4111111111111111" is a valid PAN; the second occurrence sits
    // inside a 20-digit run — never \b-bounded, never a candidate, and a
    // plain substring replace would have eaten it (ADVICE r8)
    val rows = Seq(
      (1L, "pay 4111111111111111 ref 99994111111111111111 end"),
      // two \b-bounded occurrences of the same valid PAN: both redact
      (2L, "a 4111111111111111 b 4111111111111111 c"))
      .toDF("id", "text")
    val got = graft.operators.Scrub.scrubCards(rows, "text")
      .select("id", "n_cc_valid", "cc_redacted")
      .orderBy("id").as[(Long, Long, String)].collect().toSeq
    assert(got(0)._3 === "pay <CC> ref 99994111111111111111 end", got(0)._3)
    assert(got(1)._3 === "a <CC> b <CC> c", got(1)._3)
  }

  test("scrubCards leaves a valid PAN's digits alone when they sit " +
      "SEPARATOR-adjacent inside a longer Luhn-invalid candidate") {
    // the \b-replace trap the positional rebuild exists for: in
    // "9991 4111 1111 1111 1111" the candidate is the Luhn-INVALID
    // 16-digit prefix "9991 4111 1111 1111" (greedy 19 digits can't end
    // on \b inside the final group, so backtrack stops at the space) —
    // preserved by contract. But the valid PAN's exact text occurs
    // space-bounded inside that run, so a \b-bounded re-replace of the
    // candidate's TEXT would redact mid-run, eating a region whose own
    // candidate said "leave alone" and desyncing n_cc_valid from the
    // rewritten text. Positional interleave only touches match sites.
    val txt = "pay 4111 1111 1111 1111 ref 9991 4111 1111 1111 1111 end"
    val got = graft.operators.Scrub.scrubCards(
        Seq(Tuple1(txt)).toDF("text"), "text")
      .select("n_cc_candidates", "n_cc_valid", "cc_redacted")
      .as[(Long, Long, String)].head()
    assert(got._1 === 2L, "valid PAN + invalid 16-digit prefix candidate")
    assert(got._2 === 1L)
    assert(got._3 === "pay <CC> ref 9991 4111 1111 1111 1111 end", got._3)
  }

  test("scrub is one codegen'd projection — no shuffle, no UDF") {
    val plan = Scrub.scrub(Seq("x").toDF("text"), "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLInvoke"), plan.take(2000))
  }
}
