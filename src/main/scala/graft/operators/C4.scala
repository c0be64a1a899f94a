package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style web-text cleaning — Raffel et al. 2020 ("Exploring the Limits
  * of Transfer Learning with a Unified Text-to-Text Transformer", §2.2),
  * the third canonical curation rule-pack alongside Gopher
  * ([[Quality.rulePack]]/repetition, q165) and RefinedWeb line dedup
  * ([[Dedup.lineDedup]], q166):
  *
  *  - line retention: keep only lines ending in terminal punctuation,
  *    with at least `minWords` words, not mentioning "javascript";
  *  - page drops: fewer than `minSentences` retained sentences, the
  *    phrase "lorem ipsum", a curly bracket, or any bad-word token;
  *  - corpus dedup: discard all but the FIRST occurrence of any
  *    `n`-sentence span occurring more than once ([[spanDedup]]).
  *
  * Reference tie-in: the reference ingests raw web text before embedding
  * (`SURVEY.md` §2 F2-F5 ingest surface); C4 is the published cleaning
  * discipline for that step at web-corpus scale.
  *
  * Scale shape: [[clean]] is ONE row-local pass — every rule is a
  * per-line / per-page string predicate (pure codegen: rlike, split,
  * higher-order filter), ZERO shuffles, embarrassingly parallel at any
  * corpus size; at 100 TB it rides the scan. [[spanDedup]] is
  * [[Dedup.spanScrubUnits]] at sentence granularity — one hash-key
  * shuffle + an equi-join back + a duplication-bounded per-doc window,
  * never all-pairs.
  */
object C4 {

  /** C4's line-retention predicate (§2.2 bullets 1–2, 5): terminal
    * punctuation (period / exclamation / question mark / closing double
    * quote — the paper's set), at least `minWords` whitespace words
    * (paper value 3), and no standalone word "javascript" in any case
    * (the paper drops such lines as script boilerplate). Pure codegen.
    */
  def lineKept(line: Column, minWords: Int = 3): Column =
    line.rlike("[.!?\"]\\s*$") &&
      size(split(trim(line), "\\s+")) >= minWords &&
      !lower(line).rlike("\\bjavascript\\b")

  /** Deterministic sentence split shared by [[clean]]'s sentence count
    * and [[spanDedup]]: terminal punctuation followed by whitespace ends
    * a sentence (the mark stays attached). Implemented as a
    * replace-then-split on a \u0001 seam so the exact same construction
    * is expressible in the DuckDB oracle (RE2 has no lookbehind).
    */
  def sentences(text: Column): Column =
    split(regexp_replace(trim(coalesce(text, lit(""))),
      "([.!?])\\s+", "$1\u0001"), "\u0001")

  /** The full page-cleaning pass. Output, one row per input doc:
    * (id, n_lines, kept_lines, n_sentences, has_lorem, has_brace,
    * has_bad_word, kept_page, clean_text) — clean_text is the retained
    * lines rejoined for kept pages and '' for dropped pages, flags kept
    * for rejection auditing (the q165 rejection-matrix discipline).
    *
    * `n_sentences` counts terminal-punctuation groups in the RETAINED
    * text (line retention runs first, as in the paper); page-level
    * content flags (lorem ipsum / curly bracket / bad words) look at the
    * ORIGINAL page — a dirty page is dirty even if the offending line
    * would have been dropped.
    */
  def clean(df: DataFrame, idCol: String, textCol: String,
      minSentences: Int = 5, minWords: Int = 3,
      badWords: Seq[String] = Nil, keepCols: Seq[String] = Nil): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val lines = split(text, "\n")
    val keptArr = filter(lines, l => lineKept(l, minWords))
    val retained = array_join(keptArr, "\n")
    // Tokens are compared after stripping leading/trailing ASCII
    // punctuation, so "badword!" / "(badword)" still trip the page gate —
    // C4's blocklist filtering is word-level, not whitespace-chunk-level
    // (Raffel et al. 2020 §2.2).
    val hasBad =
      if (badWords.isEmpty) lit(false)
      else arrays_overlap(
        transform(split(lower(text), "\\s+"),
          t => regexp_replace(t, "^\\p{Punct}+|\\p{Punct}+$", "")),
        lit(badWords.map(_.toLowerCase).toArray))
    df.select(col(idCol) +:
        size(lines).cast("long").as("n_lines") +:
        size(keptArr).cast("long").as("kept_lines") +:
        regexp_count(retained, lit("[.!?]+")).cast("long").as("n_sentences") +:
        contains(lower(text), lit("lorem ipsum")).as("has_lorem") +:
        contains(text, lit("{")).as("has_brace") +:
        hasBad.as("has_bad_word") +:
        retained.as("__retained") +:
        keepCols.map(col): _*)
      .withColumn("kept_page",
        col("n_sentences") >= minSentences && !col("has_lorem") &&
          !col("has_brace") && !col("has_bad_word"))
      .withColumn("clean_text",
        when(col("kept_page"), col("__retained")).otherwise(lit("")))
      .drop("__retained")
  }

  /** C4 §2.2's corpus dedup: "we discarded all but one of any
    * three-sentence span occurring more than once in the data set" —
    * keep-first overlapping-window span scrub at SENTENCE granularity
    * (earliest corpus occurrence under the exact id·posCap+pos composite
    * order survives; every later occurrence's sentences are removed,
    * overlapping removals union-merged). Output: (id, n_sentences,
    * n_spans, removed_sentences, clean_text), survivors rejoined with a
    * single space.
    */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, posCap: Long = 1L << 20): DataFrame = {
    require(n >= 1, s"C4.spanDedup: n $n must be >= 1")
    require(posCap >= 2, s"C4.spanDedup: posCap $posCap must be >= 2")
    val units = df.select(col(idCol), sentences(col(textCol)).as("units"))
    Dedup.spanScrubUnits(units, idCol, n, posCap, " ", "C4.spanDedup")
      .withColumnRenamed("n_units", "n_sentences")
      .withColumnRenamed("removed_units", "removed_sentences")
  }
}
