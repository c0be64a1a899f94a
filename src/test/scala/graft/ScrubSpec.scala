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

  test("scrub is one codegen'd projection — no shuffle, no UDF") {
    val plan = Scrub.scrub(Seq("x").toDF("text"), "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLInvoke"), plan.take(2000))
  }
}
