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
    // double-escaped decodes ONE level (&amp; replaced last)
    assert(strip("&amp;lt;") === "&lt;")
    // whitespace collapse + trim
    assert(strip("  <div>\n\n  spaced   out \t</div>  ") === "spaced out")
    // null-safe
    assert(Seq[Option[String]](None).toDF("h")
      .select(Markup.stripHtml(col("h"))).as[String].head() === "")
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
