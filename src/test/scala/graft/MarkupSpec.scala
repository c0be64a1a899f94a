package graft

import org.apache.spark.sql.functions._

import graft.operators.Markup

/** HTML/markup extraction — per-rule behavior of [[Markup.stripHtml]]
  * and the exact-integer density signals of [[Markup.markupStats]].
  */
class MarkupSpec extends SparkSpec {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(Markup.stripHtml(col("h"))).as[String].head()

  test("stripHtml: tags to spaces, blocks with contents, comments, " +
      "entities after tags, whitespace collapse") {
    // block boundaries separate words
    assert(strip("<p>a</p><p>b</p>") === "a b")
    // script/style vanish WITH contents, even when the code contains '<'
    assert(strip("<script>var x = 1; if (x < 2) { x++; }</script>keep") ===
      "keep")
    assert(strip("<style>p { color: red; }</style>keep") === "keep")
    assert(strip("<SCRIPT type=\"module\">secret()</SCRIPT>ok") === "ok")
    // comments vanish, multi-line too
    assert(strip("a<!-- hidden\nsecret -->b") === "a b")
    // entities decode AFTER tag removal: escaped markup stays text
    assert(strip("<p>Tom &amp; Jerry say &quot;hi&quot;&nbsp;&lt;b&gt;</p>")
      === "Tom & Jerry say \"hi\" <b>")
    // double-escaped decodes ONE level (single pass, no output re-scan)
    assert(strip("&amp;lt;") === "&lt;")
    // whitespace collapse + trim
    assert(strip("  <div>\n\n  spaced   out \t</div>  ") === "spaced out")
    // null-safe
    assert(Seq[Option[String]](None).toDF("h")
      .select(Markup.stripHtml(col("h"))).as[String].head() === "")
  }

  test("stripHtml: numeric character references — decimal, hex, leading " +
      "zeros decode in the Latin-1 range; everything else passes through " +
      "verbatim (the bounded r12 contract)") {
    // decimal + hex + leading zeros, ASCII and Latin-1
    assert(strip("Caf&#233; r&#xE9;sum&#x00E9;") === "Café résumé")
    assert(strip("&#65;&#66;&#67;") === "ABC") // adjacent references
    assert(strip("say &#039;hi&#39;") === "say 'hi'") // old literal subsumed
    // decoded control whitespace (9/10/13) normalizes in the collapse
    assert(strip("a&#9;b&#10;c&#13;d") === "a b c d")
    // both hex-marker cases decode (r13 — the spec's case-insensitive
    // marker; digits case-fold too)
    assert(strip("&#XE9; &#Xe9; &#xE9;") === "é é é")
    // pass-through: out-of-range (above Latin-1), malformed decimal
    // (hex letters without the x), below-32 non-whitespace, and an x
    // with no digits
    assert(strip("&#x2019;") === "&#x2019;")
    assert(strip("&#8217;") === "&#8217;")
    assert(strip("&#1e3;") === "&#1e3;")
    assert(strip("&#7;&#x1f;&#x0;") === "&#7;&#x1f;&#x0;")
    assert(strip("&#x;&#;") === "&#x;&#;")
    // ONE pass, no output re-scan: double escapes decode one level only
    assert(strip("&amp;#60;") === "&#60;")
    assert(strip("&#38;#60;") === "&#60;")
    // numeric runs BEFORE the named table: a numeric amp can complete a
    // named entity (consistent with the oracle twin's stage order)
    assert(strip("&#38;lt;") === "<")
  }

  test("stripHtml: named character references — Latin-1 + typography " +
      "names decode case-sensitively; whitespace names become plain " +
      "space, zero-width names vanish, unknown names pass through " +
      "(the bounded r13 contract)") {
    // Latin-1 names, case-sensitive (É vs é are different entities)
    assert(strip("&Eacute;clair &eacute;clair") === "Éclair éclair")
    assert(strip("&EACUTE;") === "&EACUTE;") // not a table name: verbatim
    assert(strip("se&ntilde;or &copy; 2020 &frac12; &szlig;") ===
      "señor © 2020 ½ ß")
    // typography names beyond Latin-1
    assert(strip("a &mdash; b&hellip; &euro;5 &ldquo;q&rdquo;") ===
      "a — b… €5 “q”")
    // zero-width / formatting names vanish: a soft-hyphenated word is
    // ONE word after extraction
    assert(strip("hy&shy;phen a&zwj;b &lrm;x") === "hyphen ab x")
    // whitespace names decode to PLAIN space, so the collapse sees them
    assert(strip("a&nbsp;&ensp;&emsp;&thinsp;b") === "a b")
    // unknown names verbatim; bare '&' untouched
    assert(strip("&unknown; AT&T") === "&unknown; AT&T")
    // single pass, no output re-scan: the & emitted by &amp; can never
    // complete a later named entity
    assert(strip("&amp;eacute;") === "&eacute;")
  }

  test("stripHtml: the r14 WHATWG-tail names — Greek, arrows, math " +
      "operators, delimiters, card suits — decode case-sensitively") {
    // Greek, case-sensitive three ways: Σ vs σ vs final-form ς
    assert(strip("&Sigma;&sigma;&sigmaf;") === "Σσς")
    assert(strip("&alpha;&beta;&gamma; &Omega;") === "αβγ Ω")
    // arrows, both case forms (&rarr; → vs &rArr; ⇒)
    assert(strip("a &rarr; b &rArr; c &harr; d") === "a → b ⇒ c ↔ d")
    // math operators
    assert(strip("x &ne; y, n &le; m &and; p &ge; q") === "x ≠ y, n ≤ m ∧ p ≥ q")
    assert(strip("&sum; &prod; &int; &infin; &radic;2 &asymp; 1.414") ===
      "∑ ∏ ∫ ∞ √2 ≈ 1.414")
    assert(strip("A &sub; B &isin; C &empty; &forall;x &exist;y") ===
      "A ⊂ B ∈ C ∅ ∀x ∃y")
    // technical delimiters + suits + letterlike
    // &lang;/&rang; are U+2329/U+232A (HTML4's angle brackets), which
    // render identically to the CJK U+3008/U+3009 — escape them
    assert(strip("&lceil;x&rceil; &lang;k,v&rang; &hearts;&spades;") ===
      "⌈x⌉ 〈k,v〉 ♥♠")
    assert(strip("&real;(z) &image;(z) &weierp; &alefsym;") === "ℜ(z) ℑ(z) ℘ ℵ")
    // short operator names stay case-sensitive lookups, not prefixes:
    // &pi; decodes, &Pi; decodes differently, &PI; is unknown-verbatim
    assert(strip("&pi; &Pi; &PI;") === "π Π &PI;")
  }

  test("entity decodes strip U+0001 before scanning (r15): the twin " +
      "sentinel cannot corrupt either engine, and a reference split by " +
      "the control char still decodes") {
    import graft.functions.expressions.{DecodeNamedEntitiesUtil,
      DecodeNumericEntitiesUtil}
    import org.apache.spark.unsafe.types.UTF8String
    def named(s: String): String =
      DecodeNamedEntitiesUtil.decode(UTF8String.fromString(s)).toString
    def num(s: String): String =
      DecodeNumericEntitiesUtil.decode(UTF8String.fromString(s)).toString
    // the control char vanishes even with no entity present
    assert(named("a\u0001b") === "ab")
    assert(num("a\u0001b") === "ab")
    // stripping happens BEFORE the scan: a reference torn apart by the
    // sentinel reassembles and decodes
    assert(named("&am\u0001p;") === "&")
    assert(num("&#\u00016\u00010;") === "<")
    // and entity-free text with the char still normalizes
    assert(named("\u0001") === "")
    // U+0001 inside otherwise-decoding text
    assert(named("x &lt;\u0001 y") === "x < y")
  }

  test("markupStats: exact-integer density signals") {
    val html = "<html><body><a href=\"/\">x</a><A HREF=\"/y\">y</A>" +
      "<p>ten chars.</p></body></html>"
    val got = Seq((1L, html)).toDF("id", "h")
    val row = Markup.markupStats(got, "id", "h").head()
    assert(row.getAs[String]("clean_text") === "x y ten chars.")
    assert(row.getAs[Long]("n_raw_chars") === html.length.toLong)
    assert(row.getAs[Long]("n_text_chars") === 14L)
    assert(row.getAs[Long]("text_ratio_permille") ===
      14L * 1000L / html.length)
    assert(row.getAs[Long]("n_tags") === 10L)
    assert(row.getAs[Long]("n_links") === 2L) // case-insensitive <a
    // empty page: ratio 0, not a divide-by-zero
    val empty = Markup.markupStats(Seq((2L, "")).toDF("id", "h"), "id", "h")
      .head()
    assert(empty.getAs[Long]("text_ratio_permille") === 0L)
    // keepCols ride through
    val kept = Markup.markupStats(
        Seq((3L, "<p>t</p>", "s9")).toDF("id", "h", "src"),
        "id", "h", keepCols = Seq("src"))
      .select("src").as[String].head()
    assert(kept === "s9")
  }

  test("markupStats plan is row-local: zero shuffles") {
    val df = Markup.markupStats(
      Seq((1L, "<p>a</p>")).toDF("id", "h"), "id", "h")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
