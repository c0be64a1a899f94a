package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curate, Dsir}

class CurateSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "quantum field theory predicts decay outcomes", "en"),
    (2L, "quantum field theory predicts decay outcomes", "en"), // exact dup of 1
    (3L, "casino bonus free spins now", "en"),                  // blocklisted
    (4L, "tiny", "en"),                                         // too short
    (5L, "entanglement violates local realism in experiments", "en"),
    (6L, "benchmark question about entangled states here", "en"),
    (7L, "der schnelle braune fuchs springt heute wieder", "de"))
    .toDF("doc_id", "text", "lang")

  test("all stages compose: dedup, blocklist, gate, selection, ordering") {
    val bench = Seq((100L, "benchmark question about entangled states here"))
      .toDF("doc_id", "text")
    val got = Curate.run(corpus, "doc_id", "text", Curate.Config(
        exactDedup = true,
        decontaminateBench = Some(bench), decontaminateN = 4,
        blocklist = Seq("casino"),
        minTokens = 3L,
        dsirTarget = Some(col("lang") === "en"), dsirTopN = 10,
        dsirBuckets = 256,
        curriculumBandWidth = Some(3L)))
      .orderBy("ord")
    val ids = got.select("doc_id").as[Long].collect().toSeq
    // 2 deduped (1 survives), 3 blocklisted, 4 gated, 6 contaminated;
    // 1, 5, 7 survive with an ord column
    assert(ids.toSet == Set(1L, 5L, 7L), s"got $ids")
    assert(got.columns.contains("ord") && got.columns.contains("mean_score"))
    val bands = got.select("band").as[Long].collect().toSeq
    assert(bands === bands.sorted, "curriculum ord must follow bands")
  }

  test("a default config is a token-count gate only (no silent stages)") {
    val got = Curate.run(corpus, "doc_id", "text",
        Curate.Config(exactDedup = false))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("span dedup stage rewrites text and drops emptied docs") {
    val dup = Seq(
      (1L, "aa bb aa bb cc dd"),
      (2L, "aa bb aa bb")) // all chunks owned by doc 1 -> emptied, dropped
      .toDF("doc_id", "text")
    val got = Curate.run(dup, "doc_id", "text", Curate.Config(
        exactDedup = false, spanDedupK = Some(2)))
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got.keySet == Set(1L))
    // keep-first collapses the WITHIN-doc repeat too: the second "aa bb"
    // chunk is a later occurrence of the first
    assert(got(1L) == "aa bb cc dd")
  }

  test("html extract stage strips markup first; all-markup docs drop " +
      "with their own fate") {
    val pages = Seq(
      (1L, "<html><body><p>real prose one here.</p>" +
        "<script>var x = 1;</script></body></html>"),
      (2L, "<div><style>p{}</style><!-- only markup --></div>"), // -> ''
      (3L, "plain text untouched."))
      .toDF("doc_id", "text")
    val cfg = Curate.Config(exactDedup = false, htmlExtract = true)
    val got = Curate.run(pages, "doc_id", "text", cfg)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "real prose one here.",
      3L -> "plain text untouched."))
    val fates = Curate.explain(pages, "doc_id", "text", cfg)
      .as[(Long, String)].collect().toMap
    assert(fates(2L) === "html_empty" && fates(1L) === "kept")
    // stage ORDER: extraction feeds the C4 rules (the stripped prose
    // passes a sentence gate its tag-soup form would fail)
    val ordered = Curate.run(
      Seq((9L, "<p>One real line stays.</p><p>Two real lines stay.</p>" +
        "<p>Three lines stay here.</p>")).toDF("doc_id", "text"),
      "doc_id", "text",
      Curate.Config(exactDedup = false, htmlExtract = true,
        c4MinSentences = Some(3)))
    assert(ordered.count() === 1L)
  }

  test("pii redaction rewrites before dedup keys; domain cap rejects " +
      "with its own fate") {
    // two docs identical EXCEPT for rotated tracking URLs: only the
    // redacted form dedups them together (the stage-order point)
    val docs = Seq(
      (1L, "read this at https://a.io/?tok=111 thanks", "a.io"),
      (2L, "read this at https://a.io/?tok=222 thanks", "a.io"),
      (3L, "mail me: someone@example.com now", "b.org"),
      (4L, "pure text from the capped domain number four", "spam.net"),
      (5L, "pure text from the capped domain number five!", "spam.net"),
      (6L, "pure text from the capped domain number six!!", "spam.net"))
      .toDF("doc_id", "text", "domain")
    val cfg = Curate.Config(exactDedup = true, piiRedact = true,
      domainCap = Some(("domain", 2)))
    val got = Curate.run(docs, "doc_id", "text", cfg)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // 1/2 collapse through the <URL> placeholder; email redacted;
    // spam.net keeps its 2 longest (6: 46 chars, 5: 45) and drops 4
    assert(got.keySet === Set(1L, 3L, 5L, 6L), got.toString)
    assert(got(1L) === "read this at <URL> thanks")
    assert(got(3L) === "mail me: <EMAIL> now")
    val fates = Curate.explain(docs, "doc_id", "text", cfg)
      .as[(Long, String)].collect().toMap
    assert(fates(4L) === "domain_capped")
    assert(fates(2L) === "exact_dup")
    assert(fates(5L) === "kept" && fates(1L) === "kept")
    // domainCap is corpus-shape: the streaming twin raises
    val ex = intercept[IllegalArgumentException] {
      graft.streaming.StreamCuration.run(docs, "doc_id", "text", cfg)
    }
    assert(ex.getMessage.contains("domainCap"), ex.getMessage)
  }

  test("exactDedupKey=folded collapses unicode republications the byte " +
      "key misses; unknown forms fail loud") {
    val docs = Seq(
      (1L, "Caf\u00e9 menu today"),  // NFC
      (2L, "Cafe\u0301 menu today"), // NFD twin — same text, other bytes
      (3L, "cafe menu today"),        // accent-stripped republication
      (4L, "a wholly different doc")).toDF("doc_id", "text")
    val gotFolded = Curate.run(docs, "doc_id", "text",
        Curate.Config(exactDedup = true, exactDedupKey = "folded"))
      .select("doc_id").as[Long].collect().toSet
    assert(gotFolded === Set(1L, 4L)) // min-id survivor of the fold group
    val gotByte = Curate.run(docs, "doc_id", "text",
        Curate.Config(exactDedup = true))
      .select("doc_id").as[Long].collect().toSet
    assert(gotByte === Set(1L, 2L, 3L, 4L)) // byte key sees 4 distinct
    val fates = Curate.explain(docs, "doc_id", "text",
        Curate.Config(exactDedup = true, exactDedupKey = "folded"))
      .as[(Long, String)].collect().toMap
    assert(fates(2L) === "exact_dup" && fates(3L) === "exact_dup")
    val ex = intercept[IllegalArgumentException] {
      Curate.run(docs, "doc_id", "text",
        Curate.Config(exactDedupKey = "nfkc"))
    }
    assert(ex.getMessage.contains("byte|canonical|folded"), ex.getMessage)
  }

  test("domainCapFromUrl derives the PSL domain in-pipeline and equals " +
      "the caller-prepared-column form; the two forms are exclusive") {
    import graft.operators.Web
    // three raw-URL shapes that all root to ONE registered domain once
    // canonicalized (www./port/tracking noise) + a PRIVATE-suffix site
    val docs = Seq(
      (1L, "doc one from the capped site with padding", "HTTP://WWW.News.Site.co.uk:80/a?utm_source=x"),
      (2L, "doc two from the capped site longer padding!", "https://news.site.co.uk/b"),
      (3L, "doc three from the capped site yet more padding", "https://cdn.news.site.co.uk:443/c"),
      (4L, "a github pages doc", "https://proj.user.github.io/d"))
      .toDF("doc_id", "text", "url")
    val cfgUrl = Curate.Config(exactDedup = false,
      domainCapFromUrl = Some(("url", 2)))
    val gotUrl = Curate.run(docs, "doc_id", "text", cfgUrl)
      .select("doc_id").as[Long].collect().toSet
    // site.co.uk keeps its 2 longest texts (3: 47 chars, 2: 44); the
    // github.io site boundary is user.github.io — under the cap
    assert(gotUrl === Set(2L, 3L, 4L), gotUrl.toString)
    // equivalence: deriving the column by hand and using domainCap
    // yields the identical survivor set
    val prepared = docs.withColumn("domain", Web.registeredDomainPsl(
      Web.hostOf(Web.canonicalizeUrl(col("url")))))
    val gotCol = Curate.run(prepared, "doc_id", "text",
        Curate.Config(exactDedup = false, domainCap = Some(("domain", 2))))
      .select("doc_id").as[Long].collect().toSet
    assert(gotCol === gotUrl)
    // fate attribution rides the same stage name
    val fates = Curate.explain(docs, "doc_id", "text", cfgUrl)
      .as[(Long, String)].collect().toMap
    assert(fates(1L) === "domain_capped")
    // both forms at once is a config error, fail-loud
    val ex = intercept[IllegalArgumentException] {
      Curate.run(docs, "doc_id", "text", Curate.Config(
        domainCap = Some(("domain", 2)),
        domainCapFromUrl = Some(("url", 2))))
    }
    assert(ex.getMessage.contains("not both"), ex.getMessage)
  }

  test("domainCapFromUrl: junk-domain rows (malformed URL → EMPTY " +
      "derived key) are exempt from the cap, not lumped into one " +
      "capped bucket — while a single-label host stays capped as its " +
      "own bucket") {
    // three real docs on ONE domain (cap 2 drops the shortest) plus
    // three docs with fine text and junk URL metadata — under the old
    // policy all three junk rows shared the single '' domain and the
    // cap silently dropped one (ADVICE r12); now they pass through.
    // Three more docs on a SINGLE-LABEL host (dot-less but non-empty
    // key): a real host, so the crawl-skew cap must bind (ADVICE r13 —
    // the r13 dot-less exemption let such a host flood uncapped)
    val docs = Seq(
      (1L, "capped site doc one padding", Some("https://site.com/a")),
      (2L, "capped site doc two more padding", Some("https://site.com/b")),
      (3L, "capped site doc three even more padding", Some("https://site.com/c")),
      (4L, "fine text junk url", Some("not a url at all")),
      (5L, "fine text other junk", Some("also::junk")),
      (6L, "fine text null url", None),
      (7L, "intranet doc one padding", Some("https://localhost/a")),
      (8L, "intranet doc two more padding", Some("https://localhost/b")),
      (9L, "intranet doc three even more padding", Some("https://localhost/c")))
      .toDF("doc_id", "text", "url")
    val cfg = Curate.Config(exactDedup = false,
      domainCapFromUrl = Some(("url", 2)))
    val got = Curate.run(docs, "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(2L, 3L, 4L, 5L, 6L, 8L, 9L), got.toString)
    val fates = Curate.explain(docs, "doc_id", "text", cfg)
      .as[(Long, String)].collect().toMap
    assert(fates(1L) === "domain_capped")
    assert(fates(7L) === "domain_capped", fates.toString)
    assert(Seq(4L, 5L, 6L).forall(fates(_) === "kept"), fates.toString)
  }

  test("line dedup stage scrubs cross-doc boilerplate lines; explain " +
      "labels fully-boilerplate docs line_dedup_empty") {
    val docs = Seq(
      (1L, "alpha body\nSubscribe to our newsletter"),
      (2L, "beta body\nsubscribe TO OUR newsletter"), // case-variant key
      (3L, "Subscribe to our newsletter"),            // all boilerplate
      (4L, "gamma body"))
      .toDF("doc_id", "text")
    val cfg = Curate.Config(exactDedup = false, lineDedupMinDocs = Some(2))
    val got = Curate.run(docs, "doc_id", "text", cfg)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "alpha body", 2L -> "beta body",
      4L -> "gamma body"))
    val fates = Curate.explain(docs, "doc_id", "text", cfg)
      .select("doc_id", "fate").as[(Long, String)].collect().toMap
    assert(fates === Map(1L -> "kept", 2L -> "kept",
      3L -> "line_dedup_empty", 4L -> "kept"))
    // corpus-shape on a stream: the config fails loud, naming the twin
    val ex = intercept[IllegalArgumentException] {
      graft.streaming.StreamCuration.run(docs, "doc_id", "text", cfg)
    }
    assert(ex.getMessage.contains("lineIndex"), ex.getMessage)
  }

  test("withCurated: same result as run, and no cached blocks leak") {
    val cfg = Curate.Config(dsirTarget = Some(col("lang") === "en"),
      dsirTopN = 5, dsirBuckets = 256, minTokens = 3L)
    // delta-based leak check: other suites in the shared session may
    // legitimately hold persisted frames (e.g. jaccardPairsPrefix's
    // materialized pair list) — withCurated must add NONE of its own
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val viaScoped = Curate.withCurated(corpus, "doc_id", "text", cfg) { df =>
      df.select("doc_id").as[Long].collect().sorted.toSeq
    }
    val viaLazy = Curate.run(corpus, "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaScoped === viaLazy)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"withCurated must release its cache: $leaked")
  }

  test("epoch-recipe stage expands the curated corpus per-source budget") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "s1"),
      (2L, "zeta eta theta iota kappa", "s1"),
      (3L, "one two three four five", "s2"))
      .toDF("doc_id", "text", "source")
    // s1 avail = 10 tokens, budget 20 -> exactly 2 copies per doc;
    // s2 unbudgeted -> dropped
    val out = Curate.run(docs, "doc_id", "text", Curate.Config(
      exactDedup = false, epochBudgets = Map("s1" -> 20L)))
    val counts = out.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 2L, 2L -> 2L), s"got $counts")
    assert(out.columns.contains("copy_idx"))
  }

  test("DSIR score artifact round-trips through the versioned store") {
    val dir = java.nio.file.Files.createTempDirectory("dsir-scores").toString
    val table = Dsir.bucketScoreTable(corpus, "text", col("lang") === "en",
      buckets = 128, scale = 10000L)
    val scores = Dsir.collectScores(table, 128, 10000L)
    Dsir.saveScores(spark, scores, dir)
    assert(Dsir.loadScores(spark, dir).toSeq === scores.toSeq)
    // newest version wins
    val scores2 = scores.map(_ + 1)
    Dsir.saveScores(spark, scores2, dir)
    assert(Dsir.loadScores(spark, dir).toSeq === scores2.toSeq)
    // frozen artifact scores identically to the in-memory array
    val a = Dsir.importanceWeights(corpus, "doc_id", "text", scores2)
      .collect().map(_.toString).sorted.toSeq
    val b = Dsir.importanceWeights(corpus, "doc_id", "text",
        Dsir.loadScores(spark, dir))
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("explain attributes every doc to its FIRST rejecting stage") {
    val bench = Seq((100L, "benchmark question about entangled states here"))
      .toDF("doc_id", "text")
    val cfg = Curate.Config(
      exactDedup = true,
      decontaminateBench = Some(bench), decontaminateN = 4,
      blocklist = Seq("casino"),
      minTokens = 3L,
      dsirTarget = Some(col("lang") === "en"), dsirTopN = 10,
      dsirBuckets = 256)
    val fates = Curate.explain(corpus, "doc_id", "text", cfg)
      .as[(Long, String)].collect().toMap
    assert(fates === Map(
      1L -> "kept", 2L -> "exact_dup", 3L -> "blocklisted",
      4L -> "token_gate", 5L -> "kept", 6L -> "contaminated",
      7L -> "kept"))
    // the non-drift guarantee: explain's kept set IS run's survivor set
    val survivors = Curate.run(corpus, "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(fates.filter(_._2 == "kept").keySet === survivors)
  }

  test("explain labels span-dedup-emptied docs and covers every input row") {
    val dup = Seq(
      (1L, "aa bb aa bb cc dd"),
      (2L, "aa bb aa bb")) // all chunks owned by doc 1 -> emptied
      .toDF("doc_id", "text")
    val fates = Curate.explain(dup, "doc_id", "text",
        Curate.Config(exactDedup = false, spanDedupK = Some(2)))
      .as[(Long, String)].collect().toMap
    assert(fates === Map(1L -> "kept", 2L -> "span_dedup_empty"))
  }

  test("repetition stage gates keyword-stuffed docs; explain labels them") {
    // doc 2 is "buy now" ×30: top-2-gram count 30 of 60 tokens → the
    // Gopher top2 gate (20%) fails it (and the periodic dup-5 coverage
    // too); doc 1's 40 distinct tokens pass every rule
    val docs = Seq(
      (1L, (1 to 40).map(i => s"tok$i").mkString(" ")),
      (2L, ("buy now " * 30).trim))
      .toDF("doc_id", "text")
    val cfg = Curate.Config(exactDedup = false, repetitionRules = true)
    val out = Curate.run(docs, "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L))
    val fates = Curate.explain(docs, "doc_id", "text", cfg)
      .as[(Long, String)].collect().toMap
    assert(fates === Map(1L -> "kept", 2L -> "repetition"))
  }

  test("dupSpan stage scrubs an unaligned re-quote inside the pipeline") {
    val w = (1 to 12).map(i => s"w$i").mkString(" ")
    val dup = Seq(
      (1L, w),
      (2L, s"p1 p2 p3 $w q1"),       // passage re-quoted at offset +3
      (3L, (1 to 8).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Curate.run(dup, "doc_id", "text",
        Curate.Config(exactDedup = false, dupSpanN = Some(8)))
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got(1L) === w)
    assert(got(2L) === "p1 p2 p3 q1", "the offset copy must be cut")
    assert(got(3L).startsWith("z1"))
    // a doc consumed whole by the scrub gets the empty-drop fate
    val whole = Seq((1L, w), (2L, w + " tail"), (3L, w)).toDF("doc_id", "text")
    val fates = Curate.explain(whole, "doc_id", "text",
        Curate.Config(exactDedup = false, dupSpanN = Some(8)))
      .as[(Long, String)].collect().toMap
    assert(fates(3L) === "dup_span_empty")
  }

  test("explain under epochBudgets: fates to the selection boundary plus " +
      "exact emitted_copies — zero-copy kept docs stay 'kept'") {
    val docs = Seq(
      (1L, "alpha beta gamma delta eps", "s1"),   // 5 tok, budget 20/10 -> 2 copies
      (2L, "zeta eta theta iota kappa", "s1"),    // 2 copies
      (3L, "one two three four five", "s2"),      // kept, UNBUDGETED -> 0 copies
      (4L, "tiny", "s1"),                          // token_gate reject
      (5L, "alpha beta gamma delta eps", "s3"))    // exact_dup of 1
      .toDF("doc_id", "text", "source")
    val cfg = Curate.Config(exactDedup = true, minTokens = 3L,
      epochBudgets = Map("s1" -> 20L))
    val got = Curate.explain(docs, "doc_id", "text", cfg)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      1L -> (("kept", 2L)),
      2L -> (("kept", 2L)),
      3L -> (("kept", 0L)), // emission decision, NOT a rejection fate
      4L -> (("token_gate", 0L)),
      5L -> (("exact_dup", 0L))), got.toString)
    // the copies column is the REAL expansion, not re-derived math:
    // sum(emitted_copies) == rows of the actual recipe output
    val expanded = Curate.run(docs, "doc_id", "text", cfg).count()
    assert(got.values.map(_._2).sum === expanded)
    // without budgets the two-column contract is unchanged
    val cols = Curate.explain(docs, "doc_id", "text",
      cfg.copy(epochBudgets = Map.empty)).columns.toSeq
    assert(cols === Seq("doc_id", "fate"))
  }

  test("C4 stages: rule-pack cleans pages first, sentence-span dedup " +
      "keeps the earliest copy; explain labels both") {
    val docs = Seq(
      (1L, "Good one stays here. Good two stays put. Good three stays on."),
      (2L, "Shared alpha line one. Shared bravo line two. Shared charlie line three. Unique two tail."),
      (3L, "Shared alpha line one. Shared bravo line two. Shared charlie line three."),
      (4L, "Only this page uses lorem ipsum badly. Second fine sentence here. Third fine sentence too."),
      (5L, "Tiny page."))
      .toDF("doc_id", "text")
    val cfg = Curate.Config(c4MinSentences = Some(3), c4SpanDedupN = Some(3),
      exactDedup = false)
    val got = Curate.run(docs, "doc_id", "text", cfg)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // 4 fails the lorem rule, 5 the sentence minimum; 3's whole text is
    // a later copy of 2's opening three-sentence span -> emptied
    assert(got.keySet === Set(1L, 2L))
    assert(got(2L).endsWith("Unique two tail."))
    val fates = Curate.explain(docs, "doc_id", "text", cfg)
      .select("doc_id", "fate").as[(Long, String)].collect().toMap
    assert(fates === Map(1L -> "kept", 2L -> "kept",
      3L -> "c4_span_empty", 4L -> "c4_rules", 5L -> "c4_rules"))
    // the sentence-span dedup is corpus-shape: the stream twin raises
    val ex = intercept[IllegalArgumentException] {
      graft.streaming.StreamCuration.run(docs, "doc_id", "text", cfg)
    }
    assert(ex.getMessage.contains("c4SpanDedupN"), ex.getMessage)
  }
}
