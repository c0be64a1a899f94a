package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/markup text extraction — the WET-extraction front gate a raw-web
  * pipeline runs BEFORE every text stage (C4/Gopher rules, dedup, DSIR
  * all assume prose, not tag soup). Kept deliberately regex-expressible
  * (no DOM parse): every rule is a row-local codegen `regexp_replace` /
  * `regexp_count`, identically replayable in the DuckDB oracle, and the
  * whole pass is ZERO-shuffle — the q171 C4 discipline at the markup
  * layer. Reference behavior cited: C4 (Raffel et al. 2020 §2.2)
  * extracts text from WET archives, which are themselves produced by
  * exactly this class of tag-strip + whitespace-normalize extraction.
  *
  * Rules, in order (the order matters and is part of the contract):
  *  1. comments `<!-- … -->` dropped (dotall, non-greedy);
  *  2. `<script>…</script>` and `<style>…</style>` dropped WITH their
  *     contents (case-insensitive; two passes — RE2 has no
  *     backreferences, so no `<(script|style)>.*?</\1>`);
  *  3. every remaining tag `<[^>]*>` becomes a single space (block
  *     boundaries must separate words: `<p>a</p><p>b</p>` → "a b");
  *  4. NUMERIC character references decoded in one pass
  *     ([[graft.functions.expressions.DecodeNumericEntities]]:
  *     `&#233;`/`&#x2019;`/`&#XE9;`-style, ASCII + Latin-1 range,
  *     out-of-range verbatim) — BEFORE the named pass, so `&amp;#60;`
  *     stays the literal `&#60;` (standard double-escape semantics);
  *  5. NAMED references decoded in one no-rescan pass
  *     ([[graft.functions.expressions.DecodeNamedEntities]]: the XML
  *     core + the HTML 4 Latin-1 set + common typography names;
  *     unknown names verbatim) — AFTER tag removal, so escaped markup
  *     in the text stays text (`&lt;b&gt;` → "<b>"), and single-pass,
  *     so `&amp;lt;` stays the literal `&lt;`;
  *  6. whitespace collapsed and trimmed.
  */
object Markup {

  /** The cleaned text column. */
  def stripHtml(html: Column): Column = {
    val noComments = regexp_replace(coalesce(html, lit("")),
      "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComments,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    // numeric references first, then the named single-pass decoder —
    // both no-rescan, so a decoded '&' can never re-trigger a decode
    // (the invariant the old replace-chain enforced by keeping &amp;
    // last, now structural)
    val numDecoded =
      graft.functions.expressions.DecodeNumericEntities.column(noTags)
    val decoded =
      graft.functions.expressions.DecodeNamedEntities.column(numDecoded)
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Markup-density quality signals, all exact integers — the jusText /
    * WET-side evidence a page-level keep/drop rule reads:
    * (clean_text, n_raw_chars, n_text_chars, text_ratio_permille,
    * n_tags, n_links). `text_ratio_permille` = 1000·text/raw on the
    * NON-EMPTY raw page (empty raw → 0); boilerplate-heavy pages score
    * low, prose-heavy pages high. One row-local projection.
    */
  def markupStats(df: DataFrame, idCol: String, htmlCol: String,
      keepCols: Seq[String] = Nil): DataFrame = {
    val raw = coalesce(col(htmlCol), lit(""))
    val cleanText = stripHtml(col(htmlCol))
    df.select(col(idCol) +:
      cleanText.as("clean_text") +:
      length(raw).cast("long").as("n_raw_chars") +:
      length(cleanText).cast("long").as("n_text_chars") +:
      regexp_count(raw, lit("<[^>]*>")).cast("long").as("n_tags") +:
      regexp_count(raw, lit("(?i)<a[\\s>]")).cast("long").as("n_links") +:
      keepCols.map(col): _*)
      // `div` (IntegralDivide) over the just-computed lengths — a second
      // row-local projection, still zero-shuffle
      .withColumn("text_ratio_permille",
        expr("n_text_chars * 1000L div greatest(n_raw_chars, 1L)"))
      .select((Seq(idCol, "clean_text", "n_raw_chars", "n_text_chars",
        "text_ratio_permille", "n_tags", "n_links") ++ keepCols).map(col): _*)
  }
}
