package graft

import org.apache.spark.sql.functions._

import graft.operators.C4

/** C4 rule-pack semantics (Raffel et al. 2020 §2.2) on adversarial
  * fixtures; corpus-level oracle parity is q171 (clean) / q172 (span
  * dedup).
  */
class C4Spec extends SparkSpec {
  import spark.implicits._

  private def cleanOne(text: String, minSentences: Int = 3,
      badWords: Seq[String] = Nil) =
    C4.clean(Seq((1L, text)).toDF("id", "text"),
        "id", "text", minSentences = minSentences, badWords = badWords)
      .select("n_lines", "kept_lines", "n_sentences", "has_lorem",
        "has_brace", "has_bad_word", "kept_page", "clean_text")
      .as[(Long, Long, Long, Boolean, Boolean, Boolean, Boolean, String)]
      .head()

  test("line retention: terminal punct, word count, javascript") {
    val (nl, kept, _, _, _, _, _, clean) = cleanOne(
      "A good first sentence here.\n" + // kept
        "Click here\n" +                // no terminal punct, 2 words
        "No terminal punctuation at all\n" + // no punct
        "so tiny.\n" +                  // < 3 words
        "Enable JavaScript to proceed.\n" + // javascript
        "Quoted lines also count fine.\"\n" + // closing quote terminal
        "Ends with a question mark?\n" +
        "Ends with an exclamation mark!")
    assert(nl === 8L)
    assert(kept === 4L)
    assert(clean === "A good first sentence here.\n" +
      "Quoted lines also count fine.\"\n" +
      "Ends with a question mark?\nEnds with an exclamation mark!")
  }

  test("sentence count runs on RETAINED text only") {
    // the dropped "Click here" line contributes nothing; the kept lines
    // carry 1 + 3 terminal-punct groups
    val r = cleanOne(
      "First kept sentence is right here.\nClick here\n" +
        "One more thought. And another one follows. Plus a third idea.")
    assert(r._3 === 4L)
    assert(r._7 === true)
  }

  test("page drops: min sentences, lorem ipsum, brace, bad words") {
    // one kept sentence < minSentences=3 -> dropped, flags false
    val few = cleanOne("Only one kept sentence lives here.")
    assert(few._3 === 1L && !few._7 && few._8 === "")
    // lorem/brace flags fire on the ORIGINAL text even when the
    // offending line is itself line-dropped (no terminal punct)
    val lorem = cleanOne("One fine sentence stays. Two fine ones stay. " +
      "Three stay here.\nLorem Ipsum dolor\nAnother good line survives.")
    assert(lorem._4 && !lorem._7 && lorem._8 === "")
    val brace = cleanOne("Good line one stays. Good two stays. " +
      "Good three stays.\nif (x) { y }\nAll fine otherwise here.")
    assert(brace._5 && !brace._7)
    val bad = cleanOne("Good line one stays. Good two stays. " +
      "Good three stays here.", badWords = Seq("stays"))
    assert(bad._6 && !bad._7)
    // exact-token match only: substrings never fire the bad-word flag
    val sub = cleanOne("Good line one stays. Good two stays. " +
      "Good three stays here.", badWords = Seq("stay"))
    assert(!sub._6 && sub._7)
    // adjacent punctuation never shields a bad word: tokens are compared
    // after stripping leading/trailing punct ("(badword!)" == "badword")
    val punct = cleanOne("Good line one stays. Good two stays. " +
      "It shouts (badword!) and still counts here.",
      badWords = Seq("badword"))
    assert(punct._6 && !punct._7)
    // ...but stripping is edge-only: an interior hyphen is part of the
    // token, so "bad-word" is NOT the token "badword"
    val hyphen = cleanOne("Good line one stays. Good two stays. " +
      "A bad-word hyphenation stays fine here.", badWords = Seq("badword"))
    assert(!hyphen._6 && hyphen._7)
  }

  test("sentence split keeps marks attached and handles runs") {
    val ss = Seq("One here. Two there! Three anywhere? Four.").toDF("t")
      .select(C4.sentences(col("t")).as("s")).as[Seq[String]].head()
    assert(ss === Seq("One here.", "Two there!", "Three anywhere?", "Four."))
  }

  test("spanDedup keeps earliest occurrence, merges overlapping removals") {
    val docs = Seq(
      (0L, "Alpha one. Bravo two. Charlie three. Unique zero."),
      (1L, "Alpha one. Bravo two. Charlie three. Unique one."),
      // doc 2: the shared triple at a LATER offset — still caught
      (2L, "Lead in two. Alpha one. Bravo two. Charlie three. Tail two.")
    ).toDF("id", "text")
    val out = C4.spanDedup(docs, "id", "text", n = 3).orderBy("id")
      .select("id", "n_sentences", "n_spans", "removed_sentences", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out(0) === ((0L, 4L, 0L, 0L,
      "Alpha one. Bravo two. Charlie three. Unique zero.")))
    assert(out(1) === ((1L, 4L, 1L, 3L, "Unique one.")))
    assert(out(2) === ((2L, 5L, 1L, 3L, "Lead in two. Tail two.")))
  }

  test("spanDedup within-doc repetition: later in-doc copy removed") {
    val docs = Seq((7L,
      "Rep a. Rep b. Rep c. Gap one. Rep a. Rep b. Rep c. End two."))
      .toDF("id", "text")
    val r = C4.spanDedup(docs, "id", "text", n = 3)
      .select("n_spans", "removed_sentences", "clean_text")
      .as[(Long, Long, String)].head()
    assert(r === ((1L, 3L, "Rep a. Rep b. Rep c. Gap one. End two.")))
  }
}
